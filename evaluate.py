#!/usr/bin/env python
"""Drop-in entry point preserving the reference evaluate.py API."""
from trx2dy.cli.evaluate import main

if __name__ == "__main__":
    main()
