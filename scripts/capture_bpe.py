"""Capture the trained BPE tokenizer at sf0.01 as literals.

``tokenize.train_bpe`` is deterministic by construction — the winning
pair per round is (max count, lexicographically smallest pair), a pure
function of the corpus — so the trained merge list and the final
word->segmentation table can be captured once and embedded as literals
by the ``bpe_encode`` DuckDB oracle (the same contract as
``capture_trained_models.py``).

Re-run whenever the tokenizer trainer or the sf0.01 documents change:

    python scripts/capture_bpe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

from featureengineer_spark import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from featureengineer_spark.operators.tokenize import train_bpe

    spark = get_spark(master="local[8]", app_name="capture-bpe")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    merges, wt = train_bpe(docs, n_merges=24)
    segs = {r["word"]: list(r["syms"]) for r in wt.collect()}
    out = {
        "n_merges": 24,
        "merges": [list(m) for m in merges],
        "segs": {w: segs[w] for w in sorted(segs)},
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "trained_bpe_sf001.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}: {len(out['merges'])} merges, {len(segs)} words")
    spark.stop()


if __name__ == "__main__":
    main()
