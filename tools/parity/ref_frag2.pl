#!/usr/bin/perl -w
use strict;
use lib '/tmp/myhtml-perl/blib/lib', '/tmp/myhtml-perl/blib/arch';
use HTML::MyHTML;
my %tagid = (
  svg=>MyHTML_TAG_SVG, g=>MyHTML_TAG_G, desc=>MyHTML_TAG_DESC,
  foreignobject=>MyHTML_TAG_FOREIGNOBJECT,
  math=>MyHTML_TAG_MATH, mtext=>MyHTML_TAG_MTEXT,
  "annotation-xml"=>MyHTML_TAG_ANNOTATION_XML, mi=>MyHTML_TAG_MI,
);
my %nsof = (
  svg=>MyHTML_NAMESPACE_SVG, g=>MyHTML_NAMESPACE_SVG, desc=>MyHTML_NAMESPACE_SVG,
  foreignobject=>MyHTML_NAMESPACE_SVG,
  math=>MyHTML_NAMESPACE_MATHML, mtext=>MyHTML_NAMESPACE_MATHML,
  "annotation-xml"=>MyHTML_NAMESPACE_MATHML, mi=>MyHTML_NAMESPACE_MATHML,
);
my $dir = $ARGV[0];
opendir(my $dh, $dir) or die $!;
my @files = sort grep { /\.html$/ } readdir($dh);
closedir($dh);
my $myhtml = HTML::MyHTML->new(MyHTML_OPTIONS_PARSE_MODE_SINGLE, 1);
for my $f (@files) {
    my ($ctx) = $f =~ /^ctx-([a-zA-Z0-9-]+)__/;
    my $key = lc($ctx);
    open(my $in, '<:raw', "$dir/$f") or die $!;
    local $/; my $body = <$in>; close($in);
    print "### $f\n";
    my $tree = $myhtml->new_tree();
    $myhtml->parse_fragment_single($tree, MyENCODING_UTF_8, $body, $tagid{$key}, $nsof{$key});
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
