#!/usr/bin/env python
"""Repo-root convenience entry: `python train_teacher.py ...`."""
from glnn_tpu.cli.train_teacher import main

if __name__ == "__main__":
    main()
