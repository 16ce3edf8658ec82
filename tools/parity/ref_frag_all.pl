#!/usr/bin/perl -w
use strict;
use lib '/tmp/myhtml-perl/blib/lib', '/tmp/myhtml-perl/blib/arch';
use HTML::MyHTML;
my %tagid = (
  div=>MyHTML_TAG_DIV, p=>MyHTML_TAG_P, b=>MyHTML_TAG_B, td=>MyHTML_TAG_TD,
  tr=>MyHTML_TAG_TR, tbody=>MyHTML_TAG_TBODY, table=>MyHTML_TAG_TABLE,
  caption=>MyHTML_TAG_CAPTION, select=>MyHTML_TAG_SELECT, option=>MyHTML_TAG_OPTION,
  optgroup=>MyHTML_TAG_OPTGROUP, ul=>MyHTML_TAG_UL, li=>MyHTML_TAG_LI,
  dl=>MyHTML_TAG_DL, head=>MyHTML_TAG_HEAD, body=>MyHTML_TAG_BODY,
  html=>MyHTML_TAG_HTML, form=>MyHTML_TAG_FORM, noscript=>MyHTML_TAG_NOSCRIPT,
  template=>MyHTML_TAG_TEMPLATE, frameset=>MyHTML_TAG_FRAMESET,
  title=>MyHTML_TAG_TITLE, textarea=>MyHTML_TAG_TEXTAREA,
  script=>MyHTML_TAG_SCRIPT, style=>MyHTML_TAG_STYLE,
  plaintext=>MyHTML_TAG_PLAINTEXT, xmp=>MyHTML_TAG_XMP, iframe=>MyHTML_TAG_IFRAME,
);
my $dir = $ARGV[0];
opendir(my $dh, $dir) or die $!;
my @files = sort grep { /\.html$/ } readdir($dh);
closedir($dh);
my $myhtml = HTML::MyHTML->new(MyHTML_OPTIONS_PARSE_MODE_SINGLE, 1);
for my $f (@files) {
    my ($ctx) = $f =~ /^ctx-([a-z0-9]+)__/;
    open(my $in, '<:raw', "$dir/$f") or die $!;
    local $/; my $body = <$in>; close($in);
    print "### $f\n";
    my $tree = $myhtml->new_tree();
    $myhtml->parse_fragment_single($tree, MyENCODING_UTF_8, $body, $tagid{$ctx}, MyHTML_NAMESPACE_HTML);
    walk($tree->document->child, 0) if $tree->document->child;
    $tree->destroy();
}
$myhtml->destroy();
sub walk {
    my ($node, $d) = @_;
    while ($node) {
        my $info = $node->info();
        my $t = $node->text(); $t = defined $t ? $t : "";
        $t =~ s/\\/\\\\/g; $t =~ s/\n/\\n/g; $t =~ s/\r/\\r/g;
        print(("  " x $d) . $info->{tag} . ($t ne "" ? " [" . $t . "]" : "") . "\n");
        walk($node->child, $d + 1) if $node->child;
        $node = $node->next;
    }
}
