#!/usr/bin/env python3
"""Synthesize an sf1-equivalent heavy-tier corpus (10x sf0.1) for the
scale rung in PLANS.md — a MEASUREMENT harness, never a gate input
(gates run only on the driver's /root/testdata fixtures).

Replication is id-shifted and content-perturbed so the 10x corpus has
realistic workload shape instead of 10 exact clones of every row:
- documents: a replica token is spliced in every 8 words, breaking most
  3-shingles (replicas are NOT near-dups of their source, so LSH bucket
  sizes grow ~linearly instead of quadratic clone clusters).
- embeddings: deterministic per-(replica, row, dim) perturbation of a
  few 1e-3 units keeps the space's cluster structure while removing
  zero-distance twins that would degenerate ANN graphs.
- events: user_id shifts by replica (10x entities, per-entity chain
  length unchanged — the 100 TB shape is more entities, not longer
  histories).

Usage: gen_sfscale.py [k] [outdir]   (default k=10, target/sf1)
"""
import hashlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def h32(*parts) -> int:
    return int.from_bytes(
        hashlib.md5(":".join(map(str, parts)).encode()).digest()[:4], "big")


def perturb_text(text: str, k: int) -> str:
    if k == 0:
        return text
    words = text.split(" ")
    out = []
    for i, w in enumerate(words):
        if i % 8 == 0:
            out.append(f"r{k}x{h32(k, i) % 97}")
        out.append(w)
    return " ".join(out)


def main() -> None:
    k_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    outdir = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
    import os
    os.makedirs(outdir, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    d = docs.to_pylist()
    out = []
    for k in range(k_reps):
        for r in d:
            t = perturb_text(r["text"], k)
            out.append({"doc_id": r["doc_id"] + k * 10_000_000,
                        "text": t, "lang": r["lang"], "source": r["source"],
                        "n_chars": len(t)})
    pq.write_table(pa.Table.from_pylist(out, schema=docs.schema),
                   f"{outdir}/documents.parquet")
    print(f"documents: {len(out)}")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    e = emb.to_pylist()
    out = []
    for k in range(k_reps):
        for r in e:
            v = r["embedding"]
            if k > 0:
                base = h32(k, r["vec_id"])
                v = [x + (((base + 2654435761 * i) % 2001) - 1000) * 1e-3
                     for i, x in enumerate(v)]
            out.append({"vec_id": r["vec_id"] + k * 10_000_000,
                        "embedding": v, "label": r["label"]})
    pq.write_table(pa.Table.from_pylist(out, schema=emb.schema),
                   f"{outdir}/embeddings.parquet")
    print(f"embeddings: {len(out)}")

    ev = pq.read_table(f"{SRC}/events.parquet")
    cols = {name: ev.column(name) for name in ev.column_names}
    parts = []
    for k in range(k_reps):
        import pyarrow.compute as pc
        t = pa.table({
            "event_id": pc.add(cols["event_id"], k * 100_000_000),
            "ts": cols["ts"],
            "user_id": pc.add(cols["user_id"], k * 1_000_000),
            "event_type": cols["event_type"],
            "value": cols["value"],
            "props": cols["props"],
        }, schema=ev.schema)
        parts.append(t)
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{outdir}/events.parquet")
    print(f"events: {big.num_rows}")


if __name__ == "__main__":
    main()
