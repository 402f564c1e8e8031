#!/usr/bin/env python
"""Drop-in entry point preserving the reference cluster.py API."""
from trx2dy.cli.cluster import main

if __name__ == "__main__":
    main()
