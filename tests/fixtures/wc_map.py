#!/usr/bin/env python3
"""Streaming wordcount mapper (Hadoop Streaming contract): line in,
'word\t1' out. Our own fixture implementation of the contract the
reference defines for its map executables."""
import sys

for line in sys.stdin:
    for word in line.lower().split():
        sys.stdout.write(f"{word}\t1\n")
