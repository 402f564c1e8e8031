#!/usr/bin/env python
"""Drop-in entry point preserving the reference run_inference.py API
(BASELINE.json north_star). Delegates to trx2dy.cli.run_inference."""
from trx2dy.cli.run_inference import main

if __name__ == "__main__":
    main()
