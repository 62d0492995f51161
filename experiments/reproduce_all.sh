#!/usr/bin/env bash
# One-command Table-3 reproduction (reference: /root/reference/README.md:
# 84-119 + experiments/*.sh): fetch datasets -> convert to the canonical
# npz layout -> run the four paper script families (SAGE teacher + GLNN
# student on CPF, ogbn-arxiv, ogbn-products) -> aggregate a table
# against the published accuracies.
#
# Usage:
#   bash experiments/reproduce_all.sh [--dry_run] [data_dir]
#
# --dry_run (or DRY_RUN=1) prints every command — including each CLI
# invocation the experiment driver would make — without executing or
# downloading anything; run it first to see the full plan. The real run
# needs network egress for the fetch steps and the `ogb` package for
# the OGB conversion; everything after that is offline.
set -euo pipefail
cd "$(dirname "$0")/.."

DRY=""
DATA="${DATA_PATH:-./data}"
for arg in "$@"; do
  case "$arg" in
    --dry_run) DRY=1 ;;
    *) DATA="$arg" ;;
  esac
done
[[ "${DRY_RUN:-0}" == "1" ]] && DRY=1

run() {
  echo "+ $*"
  [[ -n "$DRY" ]] || "$@"
}

echo "== 1/4 fetch CPF npz (cora/citeseer/pubmed/a-computer/a-photo) =="
run python tools/fetch_cpf.py --out "$DATA"

echo "== 2/4 fetch + convert OGB (needs the ogb package) =="
run python tools/convert_datasets.py ogb ogbn-arxiv --data_path "$DATA"
run python tools/convert_datasets.py ogb ogbn-products --data_path "$DATA"

echo "== 3/4 paper runs (tran + ind; num_exp/max_epoch/patience match =="
echo "==     the reference experiments/*.sh)                          =="
DRYFLAG=""
[[ -n "$DRY" ]] && DRYFLAG="--dry_run"
for exp in sage_cpf glnn_cpf sage_arxiv glnn_arxiv sage_products \
           glnn_products; do
  # shellcheck disable=SC2086
  python experiments/run_experiments.py "$exp" --data_path "$DATA" $DRYFLAG
done

echo "== 4/4 aggregate vs published Table 3 =="
run python experiments/aggregate_table3.py --out table3.txt
echo "done. Compare table3.txt against the reference README accuracies."
