#!/usr/bin/env python
"""Repo-root CLI shim: python main.py <config.yaml> (reference main.py)."""

from efgh_tpu.main import main

if __name__ == "__main__":
    main()
