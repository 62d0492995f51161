#!/bin/bash
# Thin wrapper; see run_experiments.py for the full harness.
exec python "$(dirname "$0")/run_experiments.py" sage_arxiv "$@"
