#!/usr/bin/perl -w
# Offsets axis: per-node "(indent)tag @raw_begin+raw_length" tree walk.
use strict;
use lib '/tmp/myhtml-perl/blib/lib', '/tmp/myhtml-perl/blib/arch';
use HTML::MyHTML;
my $dir = $ARGV[0];
opendir(my $dh, $dir) or die $!;
my @files = sort grep { /\.html$/ } readdir($dh);
closedir($dh);
my $myhtml = HTML::MyHTML->new(MyHTML_OPTIONS_PARSE_MODE_SINGLE, 1);
for my $f (@files) {
    open(my $in, '<:raw', "$dir/$f") or die $!;
    local $/; my $body = <$in>; close($in);
    print "### $f\n";
    my $tree = $myhtml->new_tree();
    $myhtml->parse($tree, MyENCODING_UTF_8, $body);
    walk($tree->document->child, 0) if $tree->document->child;
    $tree->destroy();
}
$myhtml->destroy();
sub walk {
    my ($node, $d) = @_;
    while ($node) {
        my $info = $node->info();
        print(("  " x $d) . $info->{tag} . " @" . $info->{raw_begin} . "\n");
        walk($node->child, $d + 1) if $node->child;
        $node = $node->next;
    }
}
