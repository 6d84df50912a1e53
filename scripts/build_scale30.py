#!/usr/bin/env python3
"""Build the 30x self-multiplied scale-probe corpus (PERF.md round-8 probe).

Replicates sf0.1 documents 30x with remapped doc_ids (offset = 1 + max
original id per replica) and writes the result as ~10 row groups so the
registration-time row-group probe sees a multi-group layout and flips the
spread exchange OFF — the 100TB-direction layout. Every other table is
symlinked from sf0.1 so the DuckDB oracle and the Spark suite read the
exact same data.

Usage: python3 scripts/build_scale30.py [outdir]   (default /tmp/sf_scale30)
Then:  sbt "runMain graft.Verify <outdir> /tmp/verify_s30 l11_simhash_hamming_join"
       python3 scripts/check_oracle.py <outdir> /tmp/verify_s30
(l11 is skipped by design: its 8-bit toy fingerprint key space is
quadratic by construction; l11b/l09b are the production shapes in gate.)
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPL = 30


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_scale30"
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{SRC}/documents.parquet")
    off = pc.max(t["doc_id"]).as_py() + 1
    parts = []
    for i in range(REPL):
        parts.append(t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            pc.add(t["doc_id"], i * off)))
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out}/documents.parquet",
                   row_group_size=(big.num_rows + 9) // 10)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    meta = pq.ParquetFile(f"{out}/documents.parquet")
    print(f"wrote {big.num_rows} docs in {meta.num_row_groups} row groups "
          f"-> {out}")


if __name__ == "__main__":
    main()
