#!/usr/bin/env python
"""BPE training at realistic merge counts — the scale follow-up to the
round-6 64-merge study (BASELINE.md "batched BPE merge passes").

Question: does the ~batch_k× pass-count advantage of batched merge
selection (``operators/bpe.py train_bpe(batch_k=...)``) hold when the
merge budget grows to real-tokenizer territory (1,000 merges), and how
much driver memory does the per-pass top-``4k`` collect actually use?

Corpus: the raw sf0.1 ``documents`` table has only **31 distinct
words** (synthetic generator word pool), so classic BPE SATURATES
after ~113 merges — every remaining pair is unique-word residue below
``min_pair_count``. That saturation is recorded as a finding in
BASELINE.md; to exercise a 1,000-merge budget the rig trains on the
SHARED diversified corpus (``bench_corpus.diversified_corpus``, also
used by ``bench_sf1_text.py``): ``REPLICAS`` copies of the table with
every word suffixed by a per-replica marker (``~r<N>``), multiplying
the distinct-word count by REPLICAS while keeping per-word
frequencies in the thousands. Scratch parquet under ``.scratch/``
(gitignored).

Methodology (matches the other bench rigs): each timed config runs in
a FRESH interpreter + SparkSession (in-session repeats are invalid —
JIT/caches) at local[32]. Per config we record wall time, the number
of merge passes actually executed (greedy disjoint selection can
accept < k winners per pass, so passes can exceed
ceil(num_merges / batch_k)), the merges learned, and the peak
driver-side bytes of the collected top-pair list (deep
``sys.getsizeof`` over the Row fields — this is the ONLY per-pass
driver transfer, so it bounds driver memory growth with batch_k).

classic ``batch_k=1`` at 1,000 merges is ~1,000 sequential Spark jobs
(~7+ min from the 64-merge rate); it is included behind ``--classic``
but not in the default study — the 64-merge table already pins its
parity and cost, and the point here is the batched scale path.

Run:  python bench_bpe_merges.py                 # batch_k 16 and 64
      python bench_bpe_merges.py --classic       # also batch_k=1
      python bench_bpe_merges.py --one K         # one config, this proc
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
NUM_MERGES = 1_000
REPLICAS = 32


def build_corpus(spark) -> str:
    """The shared diversified corpus (``bench_corpus`` — 32 replicas
    of sf0.1 documents, every word ``~r<N>``-suffixed: 31 base words
    become ~1k distinct, enough pair capacity for a 1,000-merge budget
    while frequencies stay realistic). The r8 BASELINE.md table was
    measured on this exact transform (the rig's then-inline builder
    produced the identical corpus up to surrogate doc_ids, which
    train_bpe never reads)."""
    from bench_corpus import diversified_corpus
    return diversified_corpus(spark, replicas=REPLICAS, sf_dir=SF_DIR,
                              cpus=int(CPUS))


def _deep_bytes(rows) -> int:
    total = sys.getsizeof(rows)
    for r in rows:
        total += sys.getsizeof(r)
        for v in r:
            total += sys.getsizeof(v)
    return total


def run_one(batch_k: int) -> None:
    """Train in THIS process and print one JSON line. Instruments the
    per-pass collect by monkeypatching DataFrame.collect — the train
    loop's only collect is the top-pair list, so every call it sees is
    the measured transfer. Patches the CONCRETE classic DataFrame
    class — in PySpark 4 instances are ``pyspark.sql.classic``
    DataFrames whose own ``collect`` shadows the abstract base's."""
    from pyspark.sql import SparkSession

    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame

    from wp_etl_migration_spark.operators.bpe import train_bpe

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName(f"bpe-merges-k{batch_k}")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(build_corpus(spark))

    stats = {"passes": 0, "peak_collect_bytes": 0, "peak_collect_rows": 0}
    orig_collect = DataFrame.collect

    def counting_collect(self):
        rows = orig_collect(self)
        stats["passes"] += 1
        b = _deep_bytes(rows)
        if b > stats["peak_collect_bytes"]:
            stats["peak_collect_bytes"] = b
            stats["peak_collect_rows"] = len(rows)
        return rows

    DataFrame.collect = counting_collect
    t0 = time.time()
    try:
        merges = train_bpe(docs, "text", NUM_MERGES, batch_k=batch_k)
    finally:
        DataFrame.collect = orig_collect
    wall = time.time() - t0

    print(json.dumps({
        "batch_k": batch_k,
        "num_merges": NUM_MERGES,
        "merges_learned": len(merges),
        "passes": stats["passes"],
        "peak_collect_rows": stats["peak_collect_rows"],
        "peak_collect_bytes": stats["peak_collect_bytes"],
        "wall_s": round(wall, 1),
        "first_merges": ["".join(p) for p in merges[:5]],
        "last_merges": ["".join(p) for p in merges[-3:]],
    }))
    spark.stop()


def main() -> None:
    if "--one" in sys.argv:
        run_one(int(sys.argv[sys.argv.index("--one") + 1]))
        return
    ks = [16, 64]
    if "--classic" in sys.argv:
        ks.insert(0, 1)
    failed: list[int] = []
    for k in ks:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(k)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            # Record and move on — one config's failure must not
            # discard the remaining ks' results.
            failed.append(k)
            print(f"batch_k={k} FAILED:\n{out.stderr[-2000:]}",
                  file=sys.stderr, flush=True)
            continue
        print(line[-1], flush=True)
    if failed:
        print(f"failed configs: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
