"""Replicate a driver testdata directory to a larger scale factor for
LOCAL performance measurement only (guide §1: measure at the scale the
driver actually times — BENCH_r06 ran at a driver-generated sf1.0 that
is not on disk between rounds).

Replication scheme: each table is duplicated `factor` times with
monotonically shifted integer ids (doc_id/order keys/event ids) so
group-by cardinalities and join fan-outs scale with the data instead of
collapsing onto the same keys. Dimension tables
(region/nation/customer/supplier/part) are copied as-is.

Content perturbation: verbatim replicas would make every document a
member of a `factor`-sized near-duplicate clique (and every embedding a
cosine-1.0 twin of its replicas), blowing up the minhash/simhash/ANN
pair counts far beyond what a real larger crawl contains. Each replica
k>0 therefore gets a deterministic vowel-substitution on `text` (word
stream disjoint across replicas, within-replica duplicate structure
preserved exactly) and a k-step rotation of `embedding` (norms and
within-replica geometry preserved, cross-replica cosine decorrelated).

NOT for correctness runs: oracle twins run against the real driver
testdata only.

Usage: python tools/make_sf_scale.py /root/testdata/sf0.1 /tmp/sf1.0 10
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# id columns shifted per replica: table -> [(col, stride)]
_SHIFT = {
    "documents": [("doc_id", 10_000_000)],
    "events": [("event_id", 100_000_000)],
    "embeddings": [("vec_id", 10_000_000)],
    "orders": [("o_orderkey", 100_000_000)],
    "lineitem": [("l_orderkey", 100_000_000)],
}

_COPY = ("region", "nation", "customer", "supplier", "part")


_VOWELS = "aeiou"
_RING = "aeioubcdfg"  # k=0 keeps identity on the vowels


def _vowel_table(k: int) -> dict:
    return str.maketrans(
        {v: _RING[(i + k) % len(_RING)] for i, v in enumerate(_VOWELS)})


def _perturb(r: pa.Table, name: str, k: int) -> pa.Table:
    if k == 0:
        return r
    if name == "documents":
        i = r.schema.get_field_index("text")
        tbl = _vowel_table(k)
        texts = [None if t is None else t.translate(tbl)
                 for t in r.column("text").to_pylist()]
        r = r.set_column(i, "text", pa.array(texts, type=pa.string()))
    elif name == "embeddings":
        i = r.schema.get_field_index("embedding")
        rolled = [None if e is None else e[k % len(e):] + e[:k % len(e)]
                  for e in r.column("embedding").to_pylist()]
        r = r.set_column(i, "embedding",
                         pa.array(rolled, type=r.schema.field(i).type))
    return r


def scale_table(src: str, dst: str, name: str, factor: int,
                rows_per_group: int = 8192) -> None:
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    shifts = _SHIFT.get(name, [])
    reps = []
    for k in range(factor):
        r = _perturb(t, name, k)
        for col, stride in shifts:
            i = r.schema.get_field_index(col)
            shifted = pc.add(r.column(col), pa.scalar(
                k * stride, type=r.schema.field(col).type))
            r = r.set_column(i, col, shifted)
        reps.append(r)
    out = pa.concat_tables(reps)
    pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                   row_group_size=rows_per_group)
    print(f"{name}: {t.num_rows} x {factor} -> {out.num_rows}")


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for name in _SHIFT:
        scale_table(src, dst, name, factor)
    for name in _COPY:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: copied ({t.num_rows})")


if __name__ == "__main__":
    main()
