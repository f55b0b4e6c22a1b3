#!/usr/bin/env python3
"""Streaming grep mapper: emit '1\tline' for case-insensitive matches."""
import sys

QUERY = sys.argv[1].lower() if len(sys.argv) > 1 else "product"
for line in sys.stdin:
    line = line.rstrip("\n")
    if QUERY in line.lower():
        sys.stdout.write(f"1\t{line}\n")
