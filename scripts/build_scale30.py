#!/usr/bin/env python3
"""Build the 30x self-multiplied scale-probe corpus (PERF.md round-8 probe).

Replicates sf0.1 documents 30x with remapped doc_ids (offset = 1 + max
original id per replica) and writes the result as ~10 row groups so the
registration-time row-group probe sees a multi-group layout and flips the
spread exchange OFF — the 100TB-direction layout. Every other table is
symlinked from sf0.1 so the DuckDB oracle and the Spark suite read the
exact same data.

With --events, events is ALSO replicated 30x (event_id and user_id both
offset per replica, timestamps unchanged): 3M events over 45k users —
the "more users" scale direction for the as-of/range/window family,
whose per-user history density stays constant while shuffle volume and
key cardinality grow 30x.

Usage: python3 scripts/build_scale30.py [outdir] [--events] [--repl N]
       (default outdir /tmp/sf_scale30, default N=30; --repl 100 is the
       r12 100x probe: 500k docs / 10M events)
Then:  sbt "runMain graft.Verify <outdir> /tmp/verify_s30"
       python3 scripts/check_oracle.py <outdir> /tmp/verify_s30
(r13: l11 is no longer skipped — re-keyed to a 32-bit fingerprint with
33-probe hamming ball, its bucket sizes stay sub-1 at any corpus size.)
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def replicate(name: str, id_cols: list, out: str, repl: int) -> str:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    offs = {c: pc.max(t[c]).as_py() + 1 for c in id_cols}
    parts = []
    for i in range(repl):
        p = t
        for c in id_cols:
            p = p.set_column(p.schema.get_field_index(c), c,
                             pc.add(p[c], i * offs[c]))
        parts.append(p)
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out}/{name}.parquet",
                   row_group_size=(big.num_rows + 9) // 10)
    meta = pq.ParquetFile(f"{out}/{name}.parquet")
    return f"{name}: {big.num_rows} rows in {meta.num_row_groups} row groups"


def main() -> None:
    argv = sys.argv[1:]
    repl = 30
    if "--repl" in argv:
        i = argv.index("--repl")
        repl = int(argv[i + 1])
        del argv[i:i + 2]
    args = [a for a in argv if a not in ("--events", "--embeddings")]
    with_events = "--events" in argv
    with_embeddings = "--embeddings" in argv
    out = args[0] if args else "/tmp/sf_scale30"
    os.makedirs(out, exist_ok=True)
    done = [replicate("documents", ["doc_id"], out, repl)]
    if with_events:
        done.append(replicate("events", ["event_id", "user_id"], out, repl))
    if with_embeddings:
        # identical vectors under fresh vec_ids: valid for COST-curve
        # probes (shuffle/scan/build volume scales), degenerate for
        # recall-quality reads — note it wherever the corpus is used
        done.append(replicate("embeddings", ["vec_id"], out, repl))
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"-> {out}: " + "; ".join(done))


if __name__ == "__main__":
    main()
