#!/usr/bin/env python
"""Repo-root convenience entry: `python train_student.py ...`."""
from glnn_tpu.cli.train_student import main

if __name__ == "__main__":
    main()
