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


def test_stream_replayed_epochs_are_idempotent(spark, corpus_dir):
    """foreachBatch is at-least-once; a replay of already-committed epochs
    (same checkpoint identity, e.g. checkpoint lost after the manifest
    commit) must not duplicate output snapshots."""
    workdir = tempfile.mkdtemp(prefix="textx-replay-")
    pages_dir = os.path.join(workdir, "pages")
    os.makedirs(pages_dir)
    shutil.copy(corpus_dir, os.path.join(pages_dir, "part-0.parquet"))
    out_dir = os.path.join(workdir, "extracted")

    q = stream_extract(spark, pages_dir, out_dir=out_dir,
                       checkpoint_dir=os.path.join(workdir, "ckpt"))
    q.awaitTermination(300)
    tbl = ManifestTable(out_dir)
    n_snaps = len(tbl.snapshots())
    n_rows = tbl.read(spark).count()
    assert n_snaps > 0

    # replay: fresh checkpoint state, same checkpoint identity -> same
    # epoch ids re-delivered; the sink must skip them all
    shutil.rmtree(os.path.join(workdir, "ckpt"))
    q2 = stream_extract(spark, pages_dir, out_dir=out_dir,
                        checkpoint_dir=os.path.join(workdir, "ckpt"))
    q2.awaitTermination(300)
    assert len(tbl.snapshots()) == n_snaps
    assert tbl.read(spark).count() == n_rows
