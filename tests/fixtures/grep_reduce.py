#!/usr/bin/env python3
"""Streaming grep reducer: drop the dummy key, print the payload."""
import sys

for line in sys.stdin:
    sys.stdout.write(line.partition("\t")[2])
