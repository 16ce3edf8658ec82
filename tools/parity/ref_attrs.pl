#!/usr/bin/perl -w
# text AND attribute values, document order
use utf8;
use strict;
use lib '/tmp/myhtml-perl/blib/lib', '/tmp/myhtml-perl/blib/arch';
use HTML::MyHTML;
binmode(STDOUT, ":raw");
my $dir = $ARGV[0];
opendir(my $dh, $dir) or die $!;
my @files = sort grep { /\.html$/ } readdir($dh);
closedir($dh);
my $myhtml = HTML::MyHTML->new(MyHTML_OPTIONS_PARSE_MODE_SINGLE, 1);
for my $f (@files) {
    open(my $in, '<:raw', "$dir/$f") or die $!;
    local $/; my $body = <$in>; close($in);
    my $tree = $myhtml->new_tree();
    $myhtml->parse($tree, MyENCODING_UTF_8, $body);
    print "### $f\n";
    walk($tree->document->child);
    $tree->destroy();
}
$myhtml->destroy();
sub esc { my $t = shift; $t =~ s/\\/\\\\/g; $t =~ s/\n/\\n/g; $t =~ s/\t/\\t/g; $t =~ s/\r/\\r/g; return $t; }
sub walk {
    my ($node) = @_;
    while ($node) {
        my $info = $node->info();
        if ($info->{tag_id} == MyHTML_TAG__TEXT) {
            my $t = $node->text();
            print "T " . esc($t) . "\n" if defined $t;
        } elsif ($info->{tag_id} > 2) {
            my $attrs = $info->{attr};
            if (ref($attrs) eq 'HASH') {
                for my $k (sort keys %$attrs) {
                    print "A " . $info->{tag} . " " . esc($k) . "=" . esc($attrs->{$k}) . "\n";
                }
            }
        }
        walk($node->child) if $node->child;
        $node = $node->next;
    }
}
