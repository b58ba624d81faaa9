"""One-time tokenizer-training job: learn the byte-level BPE merge
ladder over the TRAINING corpus (sf0.01 documents + the deterministic
morphology enrichment, fixtures.training_documents) with the
GPT-2-faithful pre-tokenizer, TO EXHAUSTION, and freeze it as a
generated module (projet_etl_a_rien_spark/operators/bbpe_merges_v2.py).

Run: python tools/learn_bbpe_ladder.py

r10 learned over the plain corpus and exhausted at rank 127 — the
synthetic documents table draws from a 61-pre-token vocabulary, so the
ladder was data-bounded far below production table sizes. The r11
training corpus widens the vocabulary with fixtures.enrichment_texts()
(stem x suffix inflections, code-like punctuation runs, digit runs,
contractions, multilingual words — deterministic, every type occurring
exactly twice, ~5 KB total vs the ~150 KB corpus) so the exhaustion
rank clears 500 while the high-count HEAD of the ladder stays
corpus-driven (enrichment pair counts are 2-digit; the corpus cut
region sits near count ~900). num_merges=2000 is an upper bound the
data cannot reach — the learner stops when no pair has count >= 2 and
the generated module records the achieved exhaustion rank. The shipped
DEFAULT cut is then chosen by compression band, exactly how a
production trainer chooses a vocab budget, and recorded alongside.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from projet_etl_a_rien_spark.fixtures import training_documents
from projet_etl_a_rien_spark.operators import bpe
from projet_etl_a_rien_spark.session import get_spark

OUT = "projet_etl_a_rien_spark/operators/bbpe_merges_v2.py"
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("learn-bbpe-ladder")
    docs = training_documents(spark, SF_DIR)
    t0 = time.time()
    merges = bpe.learn_bbpe_merges(
        docs,
        num_merges=2000,
        pretoken_re=bpe.GPT2_PRETOKEN_RE,
        min_pair_count=2,
    )
    elapsed = time.time() - t0
    print(f"learned {len(merges)} merges in {elapsed:.1f}s", flush=True)

    lines = [
        '"""FROZEN byte-level BPE merge ladder (GENERATED — do not edit',
        "by hand; regenerate with tools/learn_bbpe_ladder.py).",
        "",
        "Learned once over the TRAINING corpus — the sf0.01 documents",
        "table plus fixtures.enrichment_texts()'s deterministic",
        "morphology/code/digit/contraction/multilingual enrichment",
        "(train-wide, apply-anywhere: the registered encode entries",
        "apply this frozen table to the plain corpus) — with the",
        "GPT-2-faithful pre-tokenizer (bpe.GPT2_PRETOKEN_RE), run to",
        "EXHAUSTION: the learner was offered 2000 merge slots and",
        f"stopped at rank {len(merges)} because no remaining pair",
        "reaches count >= 2 — every pre-token type in the widened",
        "vocabulary has collapsed to a single symbol. The ladder is the",
        "training data's complete merge curriculum; the",
        "DEFAULT_VOCAB_CUT in operators/bpe.py is the shipped operating",
        "point, chosen (like a production trainer's vocab budget) so",
        "English bytes-per-token sits mid-band rather than at the",
        "memorization asymptote.",
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
