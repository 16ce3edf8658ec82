#!/usr/bin/perl -w
use strict;
use lib '/tmp/myhtml-perl/blib/lib', '/tmp/myhtml-perl/blib/arch';
use HTML::MyHTML;
open(my $in, '<:raw', $ARGV[0]) or die $!;
local $/; my $body = <$in>; close($in);
my $myhtml = HTML::MyHTML->new(MyHTML_OPTIONS_PARSE_MODE_SINGLE, 1);
my $tree = $myhtml->new_tree();
$myhtml->parse($tree, MyENCODING_UTF_8, $body);
my $list = [];
join_text($tree->document->child, $list) if $tree->document->child;
for my $t (@$list) {
    $t =~ s/\\/\\\\/g; $t =~ s/\n/\\n/g; $t =~ s/\t/\\t/g; $t =~ s/\r/\\r/g;
    print "$t\n";
}
sub join_text {
    my ($node, $res) = @_;
    while ($node) {
        my $info = $node->info();
        if ($info->{tag_id} == MyHTML_TAG__COMMENT ||
            $info->{tag_id} == MyHTML_TAG_STYLE ||
            $info->{tag_id} == MyHTML_TAG_SCRIPT ||
            $info->{tag_id} == MyHTML_TAG_TEXTAREA) {
            $node = $node->next; next;
        }
        if ($info->{tag_id} == MyHTML_TAG__TEXT) {
            my $text = $node->text();
            push @$res, $text unless $text =~ /^\s+$/;
        }
        join_text($node->child, $res) if $node->child;
        $node = $node->next;
    }
}
