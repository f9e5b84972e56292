"""Streaming-vs-batch equivalence: the foreachBatch stream over the corpus
directory must produce byte-identical extractions to the batch pipeline."""

import os
import shutil
import tempfile

from textextract_spark.datagen import generate_pages, golden_rows
from textextract_spark.io.table import ManifestTable
from textextract_spark.streaming.stream import stream_extract


def test_stream_matches_batch(spark, corpus_dir):
    workdir = tempfile.mkdtemp(prefix="textx-stream-")
    pages_dir = os.path.join(workdir, "pages")
    os.makedirs(pages_dir)
    shutil.copy(corpus_dir, os.path.join(pages_dir, "part-0.parquet"))

    q = stream_extract(
        spark, pages_dir,
        out_dir=os.path.join(workdir, "extracted"),
        checkpoint_dir=os.path.join(workdir, "ckpt"))
    q.awaitTermination(300)

    out = ManifestTable(os.path.join(workdir, "extracted")).read(spark)
    got = {r.url: (r.text, r.status) for r in out.collect()}
    golden = golden_rows(generate_pages(400, seed=42))
    assert got == {u: (g["text"], g["status"]) for u, g in golden.items()}
