"""Regenerate the _BPE_ENCODE_PINNED literal in queries/llm.py: runs the
bpe_encode report at every driver fixture and prints the pin rows.  Run
AFTER the pytest encoder battery (independent-reference + memo-path
equality) is green — the pin freezes a verified implementation, it does
not define correctness.

Usage: python tools/regen_bpe_encode_pin.py   (prints rows; paste into
_BPE_ENCODE_PINNED)"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_cql_streaming_db_migrator_spark.queries.llm import (
    bpe_encode,
    tokenizer_fertility,
)
from cassandra_cql_streaming_db_migrator_spark.session import build_session


def main() -> int:
    spark = build_session(app_name="regen-bpe-pin")
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        sz = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .selectExpr("sum(length(text)) AS sz")
            .collect()[0]["sz"]
        )
        rows = sorted(
            (r["len_bucket"], r["n_docs"], r["n_words"], r["n_tokens"], r["fp_sum"])
            for r in bpe_encode(spark, sf_dir).collect()
        )
        print(f"    # _BPE_ENCODE_PINNED sf{sf} (corpus size {sz})")
        for b, d, w, t, fp in rows:
            print(f"    ({sz}, {b}, {d}, {w}, {t}, {fp}),")
        frows = sorted(
            (
                r["lang"],
                r["n_docs"],
                r["n_words"],
                r["n_tokens"],
                r["fertility_x1e6"],
                r["fp_sum"],
            )
            for r in tokenizer_fertility(spark, sf_dir).collect()
        )
        print(f"    # _TOKENIZER_FERTILITY_PINNED sf{sf} (corpus size {sz})")
        for lg, d, w, t, fe, fp in frows:
            print(f"    ({sz}, '{lg}', {d}, {w}, {t}, {fe}, {fp}),")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
