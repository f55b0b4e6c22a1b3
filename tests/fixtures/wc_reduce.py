#!/usr/bin/env python3
"""Streaming wordcount reducer: sorted 'word\t1' lines in, 'word\tN'
out; relies on equal keys being adjacent (the sorted-reduce contract)."""
import itertools
import sys


def key(line: str) -> str:
    return line.partition("\t")[0]


for k, group in itertools.groupby(sys.stdin, key=key):
    total = sum(int(line.partition("\t")[2]) for line in group)
    sys.stdout.write(f"{k}\t{total}\n")
