"""Driver-contract checks at sf0.001: every queries() entry runs, every
oracle_sql() twin matches (row count, columns, order-insensitive values) —
the same comparison the driver performs at sf0.01."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(rows):
    def nv(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, bytes):
            return v.hex()
        return v
    return sorted(tuple((k, nv(r[k])) for k in sorted(r)) for r in rows)


QUERIES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERIES)
def test_query_vs_oracle(spark, sf_dir, duck, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, sf_dir)
    srows = [r.asDict() for r in sdf.collect()]
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert isinstance(srows, list)  # rows-only: must run, >=0 rows
        return
    drows = duck.sql(oracle).df().to_dict("records")
    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    if srows:
        assert sorted(srows[0]) == sorted(drows[0]), "column names differ"
    assert _normalize(srows) == _normalize(drows)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"url", "text", "spans", "status", "fmt"} <= set(df.columns)
    assert all(r.status in ("ok", "empty") or r.status.startswith("error")
               for r in rows)
    # synthesized pages wrap doc text in boilerplate; extraction must
    # recover content for the overwhelming majority
    ok = sum(1 for r in rows if r.status == "ok")
    assert ok / len(rows) > 0.95


def test_merge_counters(spark, tmp_path):
    from pyspark.sql import functions as F  # noqa: F401

    from textextract_spark.io.table import ManifestTable
    from textextract_spark.operators.maintenance import merge_counters

    tbl = ManifestTable(str(tmp_path / "counters"))
    day1 = spark.createDataFrame(
        [(1, "2025-01-01", 5), (2, "2025-01-01", 3)],
        "user_id INT, date STRING, requests_count INT")
    merged = merge_counters(spark, tbl, day1, ["user_id", "date"],
                            ["requests_count"])
    assert {(r.user_id, r.requests_count) for r in merged.collect()} \
        == {(1, 5), (2, 3)}
    # matched keys increment, unmatched insert (the A2 upsert semantics)
    day1b = spark.createDataFrame(
        [(1, "2025-01-01", 2), (3, "2025-01-01", 7)],
        "user_id INT, date STRING, requests_count INT")
    merged = merge_counters(spark, tbl, day1b, ["user_id", "date"],
                            ["requests_count"])
    assert {(r.user_id, r.requests_count) for r in merged.collect()} \
        == {(1, 7), (2, 3), (3, 7)}


def test_decrement_credits(spark, tmp_path):
    from textextract_spark.io.table import ManifestTable
    from textextract_spark.operators.maintenance import decrement_credits

    from textextract_spark.operators.maintenance import seed_credits

    tbl = ManifestTable(str(tmp_path / "credits"))
    seed_credits(spark, tbl, spark.createDataFrame(
        [(1, 10), (2, 3)], "user_id INT, credits INT"), "user_id")
    usage = spark.createDataFrame(
        [(1, 4), (2, 99)], "user_id INT, used INT")
    after = decrement_credits(spark, tbl, usage, "user_id", "credits",
                              "used")
    # floor at 0 (models.py:290-308 semantics)
    assert {(r.user_id, r.credits) for r in after.collect()} \
        == {(1, 6), (2, 0)}


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The MERGE stand-in must be partition-scoped (Iceberg dynamic
    overwrite): a merge touching one key rewrites only that key's hash
    bucket — untouched buckets keep their prior snapshot files."""
    import os

    from textextract_spark.io.table import ManifestTable
    from textextract_spark.operators.maintenance import (
        BUCKET_COL, merge_counters)

    tbl = ManifestTable(str(tmp_path / "c2"))
    seed = spark.createDataFrame(
        [(i, "2025-01-01", i) for i in range(40)],
        "user_id INT, date STRING, requests_count INT")
    merge_counters(spark, tbl, seed, ["user_id", "date"],
                   ["requests_count"])
    one = spark.createDataFrame(
        [(7, "2025-01-01", 100)],
        "user_id INT, date STRING, requests_count INT")
    merged = merge_counters(spark, tbl, one, ["user_id", "date"],
                            ["requests_count"])
    got = {r.user_id: r.requests_count for r in merged.collect()}
    assert got[7] == 107 and got[8] == 8 and len(got) == 40
    # the second snapshot contains exactly ONE bucket directory
    snaps = tbl.snapshots()
    assert len(snaps) == 2
    last_dir = os.path.join(tbl.path, snaps[-1]["dir"])
    bucket_dirs = [d for d in os.listdir(last_dir)
                   if d.startswith(f"{BUCKET_COL}=")]
    assert len(bucket_dirs) == 1
    assert len(snaps[-1]["replaces"][BUCKET_COL]) == 1


def test_frame_sample_non_ascii_payloads(spark, tmp_path):
    """frame_sample's UDF is byte-based and total on arbitrary binary
    payloads (the driver query's ASCII filter is only for its SQL
    oracle): planted multibyte/binary blobs yield N equal frames whose
    digests match a direct python slice."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.operators.multimodal import (
        N_FRAMES, _frame_batches)
    import pandas as pd

    payloads = ["বাংলা তথ্য লেখা বিশ্লেষণ".encode() * 3,
                bytes(range(256)), b"abc", b""]
    pdf = pd.DataFrame({"media_id": pd.Series(range(4), dtype="int64"),
                        "media": payloads})
    out = pd.concat(list(_frame_batches(iter([pdf]))))
    for mid, p in enumerate(payloads):
        flen = len(p) // N_FRAMES
        rows = out[out.media_id == mid]
        if flen == 0:
            assert rows.empty
            continue
        assert len(rows) == N_FRAMES
        for _, r in rows.iterrows():
            chunk = p[r.byte_offset:r.byte_offset + flen]
            assert r.frame_sha == hashlib.sha256(chunk).hexdigest()[:16]


def test_decrement_credits_unknown_key_is_noop(spark, tmp_path):
    """Usage for keys absent from the credits table must be a no-op and
    must NOT poison the table (an empty bucket snapshot has no parquet
    schema and would break every later read)."""
    from textextract_spark.io.table import ManifestTable
    from textextract_spark.operators.maintenance import (
        decrement_credits, seed_credits)

    tbl = ManifestTable(str(tmp_path / "c3"))
    seed_credits(spark, tbl, spark.createDataFrame(
        [(1, 10)], "user_id INT, credits INT"), "user_id")
    usage = spark.createDataFrame(
        [(999999, 4)], "user_id INT, used INT")
    after = decrement_credits(spark, tbl, usage, "user_id", "credits",
                              "used")
    assert {(r.user_id, r.credits) for r in after.collect()} == {(1, 10)}
    # table still healthy: a later real decrement works
    after2 = decrement_credits(
        spark, tbl,
        spark.createDataFrame([(1, 3)], "user_id INT, used INT"),
        "user_id", "credits", "used")
    assert {(r.user_id, r.credits) for r in after2.collect()} == {(1, 7)}


def test_decrement_credits_duplicate_usage_rows(spark, tmp_path):
    """The reference emits per-request usage rows, so duplicate keys are
    the EXPECTED input: they must be summed once, not fan out the merge
    join into duplicate key rows with conflicting credit values."""
    from textextract_spark.io.table import ManifestTable
    from textextract_spark.operators.maintenance import (
        decrement_credits, seed_credits)

    tbl = ManifestTable(str(tmp_path / "c4"))
    seed_credits(spark, tbl, spark.createDataFrame(
        [(1, 10), (2, 8)], "user_id INT, credits INT"), "user_id")
    usage = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 1), (2, 4)], "user_id INT, used INT")
    after = decrement_credits(spark, tbl, usage, "user_id", "credits",
                              "used")
    rows = after.collect()
    assert len(rows) == 2  # exactly one row per key — no join fan-out
    assert {(r.user_id, r.credits) for r in rows} == {(1, 4), (2, 4)}


def test_decrement_credits_unseeded_table_raises_clearly(spark, tmp_path):
    """An unseeded credits table must raise a clear error, not an
    AttributeError on None."""
    import pytest as _pytest

    from textextract_spark.io.table import ManifestTable
    from textextract_spark.operators.maintenance import decrement_credits

    tbl = ManifestTable(str(tmp_path / "c5"))
    usage = spark.createDataFrame([(1, 3)], "user_id INT, used INT")
    with _pytest.raises(ValueError, match="not seeded"):
        decrement_credits(spark, tbl, usage, "user_id", "credits", "used")


def test_merge_counters_empty_updates_noop(spark, tmp_path):
    """Zero-row updates must be a clean no-op on both fresh and seeded
    tables (not a crash on a schemaless zero-row parquet snapshot)."""
    from textextract_spark.io.table import ManifestTable
    from textextract_spark.operators.maintenance import merge_counters

    tbl = ManifestTable(str(tmp_path / "c6"))
    empty = spark.createDataFrame(
        [], "user_id INT, date STRING, requests_count INT")
    out = merge_counters(spark, tbl, empty, ["user_id", "date"],
                         ["requests_count"])
    assert out.count() == 0  # fresh table: empty result, schema intact
    seed = spark.createDataFrame(
        [(1, "2025-01-01", 5)],
        "user_id INT, date STRING, requests_count INT")
    merge_counters(spark, tbl, seed, ["user_id", "date"],
                   ["requests_count"])
    out2 = merge_counters(spark, tbl, empty, ["user_id", "date"],
                          ["requests_count"])
    assert {(r.user_id, r.requests_count) for r in out2.collect()} \
        == {(1, 5)}


def test_decode_media_bmp_wav_roundtrip():
    """Real stdlib codec: header fields survive the build->decode round
    trip exactly, malformed payloads raise typed errors, and unsupported
    formats raise NotImplementedError with a clear message."""
    import pytest as _pytest

    from textextract_spark.operators.multimodal import (
        build_bmp, build_wav, decode_media)

    f = decode_media(build_bmp(31, 17), "image")
    assert f == {"kind": "bmp", "width": 31, "height": 17, "bpp": 24}
    f = decode_media(build_wav(2, 44100, 16, 1000), "audio")
    assert f == {"kind": "wav", "channels": 2, "sample_rate": 44100,
                 "bits": 16, "n_samples": 1000}
    # 1x1 edge (row padding) and mono-wav edge
    assert decode_media(build_bmp(1, 1), "image")["width"] == 1
    assert decode_media(build_wav(1, 8000, 16, 1), "audio")["n_samples"] == 1
    with _pytest.raises(ValueError, match="truncated BMP"):
        decode_media(b"BM\x00\x00", "image")
    with _pytest.raises(ValueError, match="missing fmt"):
        decode_media(b"RIFF\x04\x00\x00\x00WAVE", "audio")
    with _pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        decode_media(b"\xff\xd8\xff\xe0jpeg-ish", "image")


def test_decode_media_png_pixels():
    """PNG decode is REAL: the decoded pixel plane must equal the
    synthesized pixels byte-for-byte under every per-row filter type
    (None/Sub/Up/Average/Paeth), for multi-chunk IDAT; malformed inputs
    raise typed errors."""
    import struct as _struct
    import zlib as _zlib

    import pytest as _pytest

    from textextract_spark.operators.multimodal import (
        _png_pixel, build_png, decode_media)

    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4], [4, 3, 2]):
        w, h = 13, 9
        f = decode_media(build_png(w, h, filters=filters), "image")
        assert (f["kind"], f["width"], f["height"],
                f["channels"], f["bit_depth"]) == ("png", w, h, 3, 8)
        expect = bytes(_png_pixel(x, y, c)
                       for y in range(h) for x in range(w) for c in range(3))
        assert f["pixels"] == expect, f"filters={filters}"
    # 1x1 edge
    assert decode_media(build_png(1, 1), "image")["pixels"] == bytes(
        _png_pixel(0, 0, c) for c in range(3))
    with _pytest.raises(ValueError, match="missing IHDR"):
        decode_media(b"\x89PNG\r\n\x1a\n", "image")
    # interlaced flag rejected (scope: non-interlaced)
    ihdr = _struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    body = b"IHDR" + ihdr
    chunk = (_struct.pack(">I", len(ihdr)) + body
             + _struct.pack(">I", _zlib.crc32(body)))
    with _pytest.raises(ValueError, match="interlaced"):
        decode_media(b"\x89PNG\r\n\x1a\n" + chunk, "image")


def test_decode_media_png_malformed_typed_errors():
    """Every malformed-PNG failure mode keeps the documented
    ValueError-on-malformed contract — struct.error (truncated IHDR),
    zlib.error (corrupt IDAT), KeyError (bad color type) must never
    escape raw (ADVICE r4)."""
    import struct as _struct
    import zlib as _zlib

    import pytest as _pytest

    from textextract_spark.operators.multimodal import build_png, decode_media

    def chunk(ctype, data):
        body = ctype + data
        return (_struct.pack(">I", len(data)) + body
                + _struct.pack(">I", _zlib.crc32(body)))

    sig = b"\x89PNG\r\n\x1a\n"
    # truncated IHDR payload (4 of 13 bytes)
    with _pytest.raises(ValueError, match="truncated PNG IHDR"):
        decode_media(sig + chunk(b"IHDR", b"\x00\x00\x00\x02"), "image")
    # invalid color type (7 is not in the PNG spec)
    bad_ct = _struct.pack(">IIBBBBB", 2, 2, 8, 7, 0, 0, 0)
    with _pytest.raises(ValueError, match="invalid PNG color type 7"):
        decode_media(sig + chunk(b"IHDR", bad_ct) + chunk(b"IEND", b""),
                     "image")
    # corrupt IDAT: flip bytes inside a valid image's compressed stream
    good = bytearray(build_png(4, 4))
    idat_at = bytes(good).index(b"IDAT")
    good[idat_at + 8:idat_at + 12] = b"\xff\x00\xff\x00"
    with _pytest.raises(ValueError, match="corrupt PNG IDAT"):
        decode_media(bytes(good), "image")


def test_decode_media_png_property():
    """Property: PNG build->decode is the pixel identity across sizes
    and filter choices."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from textextract_spark.operators.multimodal import (
        _png_pixel, build_png, decode_media)

    @settings(max_examples=40, deadline=None)
    @given(w=st.integers(1, 24), h=st.integers(1, 16),
           filters=st.lists(st.integers(0, 4), min_size=1, max_size=6))
    def check(w, h, filters):
        f = decode_media(build_png(w, h, filters=filters), "image")
        assert (f["width"], f["height"]) == (w, h)
        assert f["pixels"] == bytes(
            _png_pixel(x, y, c)
            for y in range(h) for x in range(w) for c in range(3))

    check()


def test_extract_mixed_docs_formats(spark, sf_dir):
    """The mixed-format driver query must exercise the pdf AND text
    dispatch branches (VERDICT r2: a CORRECTNESS row whose fmt is not
    all-'html'), with the documented two-line PDF text."""
    import __spark_entry__ as e

    rows = e._extract_mixed_docs(spark, sf_dir).collect()
    fmts = {r.fmt for r in rows}
    assert fmts == {"pdf", "text"}
    pdf_rows = [r for r in rows if r.fmt == "pdf"]
    assert pdf_rows and all(r.n_spans == 2 for r in pdf_rows)
    for r in pdf_rows[:5]:
        doc_id = int(r.url.split("://")[1])
        assert r.text == f"Document {doc_id}\nflate stream body"


def test_lang_trigram_accuracy_with_confusables(spark, tmp_path):
    """Char-trigram lang-ID accuracy >= 0.98 on a seeded multilingual
    corpus built from genuine function words across all 40 profiled
    languages, including the confusable pairs the profile deliberately
    overlaps on (' de' in de/fr/es, 'nd ' in en/de, ' не' in ru/uk,
    Arabic-script ar/fa, Devanagari hi/mr): summed-hit argmax must
    separate them."""
    import random as _random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.operators.textdata import lang_trigram

    pools = {
        "en": ("the and of is in that it was for on with the as his they "
               "at be this from but not by she or had the are into").split(),
        "de": ("der und die das ist ein eine nicht mit sich auf für den "
               "von zu im schnell wald über nach bei einer als auch").split(),
        "fr": ("le la les et des que une dans pour qui est sur pas plus "
               "par avec tout fait comme entre aussi sans très mais").split(),
        "es": ("el la los de que en un una es no con por para las del "
               "se su al lo como más pero sus fue este entre").split(),
        "it": ("di il che per non una sono gli della alla più anche "
               "come questo quella essere molto bella città nazione "
               "stazione").split(),
        "pt": ("não um uma ação coração informação os de que mais "
               "também olho velho filho sonho caminho ilha primeiro "
               "brasileiro lições").split(),
        "nl": ("de het een van en zijn niet maar ook aan door naar "
               "jaar gelijk eigenlijk moeilijk tussen deze onder "
               "welke").split(),
        "bn": ("তথ্য পাতা লেখা অনুচ্ছেদ উদাহরণ সংবাদ নিবন্ধ "
               "বিশ্লেষণ").split(),
        "ru": ("и не что на это был как его нового большого русского "
               "времени быть жить говорить здания чтения средств "
               "начать такое").split(),
        "uk": ("і що це не знання питання життя українська історія "
               "нової років суспільства розвитку міська працюють "
               "більшість").split(),
        "ar": ("في من المدينة الكتاب العالم المعلومات وهي كانت يكون "
               "منها البيانات الذين والتي عندما الناس").split(),
        "fa": ("که را می در است این برای ایران داده شهر زبان "
               "اطلاعات باشد کرد آمد").split(),
        "hi": ("है का की के और वह इस से होता लोगों समय भारत सरकार "
               "करता जाता अपने").split(),
        "mr": ("आहे येथे त्याचा त्याची शाळा मराठी झाले माहिती "
               "घरात वेळ मोठा काळात").split(),
        "ja": ("ました である という します ている ことが された "
               "ません のです について").split(),
        "zh": ("的时候 是一个 我们的 中国的 可以在 这是一 在这里 "
               "了一个 的一种 他们的").split(),
        "ko": ("습니다 니다 하는 있다 에서 으로 그리고 한국어 "
               "그리고 있다").split(),
        "tr": ("ve bir için onlar yapmak olduğunu vardır bunlar "
               "kitaplar evler yazıyor gelmek insanların").split(),
        "pl": ("w nie się przez innych polskich wielkość możliwość "
               "praca dobrego które przy rzeczy").split(),
        "sv": ("och är för att det den som har inte med detta "
               "människor många tillsammans").split(),
            "gl": ("unha cunha ningunha xente xuntanza máis non ao polo"
               "pola galego tamén moitas veces despois onde").split(),
        "ca": ("amb això què molt dels quan també anys aquesta seva"
               "catalunya canya feina veïns així hi ha").split(),
        "ro": ("și este pentru care din anului său fără după către"
               "întrucât orașului până atunci același").split(),
        "da": ("og det at ikke af på være havde hvad hvor jeg også"
               "meget noget kunne skulle næsten").split(),
        "no": ("og det at ikke av på være hadde hva hvor jeg også mye"
               "noe kunne skulle nesten").split(),
        "fi": ("ja on että ei ole mutta myös kun niin vuonna hänen"
               "jotka voi kaikki sekä jälkeen").split(),
        "cs": ("je se na že to byl jsou ale jako podle které město však"
               "může být těchto život").split(),
        "sk": ("je sa na že to bol sú ale ako podľa ktoré mesto však"
               "môže byť týchto život").split(),
        "hu": ("és az hogy nem egy van volt ezek magyar minden lehet"
               "című között szerint például").split(),
        "el": ("και του της των είναι από στο ότι αυτό όπως μετά πόλη"
               "χρόνια").split(),
        "he": ("של את על הוא זה לא אבל יש אני גם היה אחד עיר שנים").split(),
        "th": ("ของ และ ที่ ใน เป็น ไม่ ได้ มี การ ความ จาก เมือง").split(),
        "vi": ("của và là trong không được người có những một cũng như"
               "thành phố năm").split(),
        "id": ("yang dan di untuk dengan tidak adalah pada ini dari"
               "orang mereka kota tahun sebuah").split(),
        "ms": ("yang dan di untuk dengan tidak ialah pada ini daripada"
               "orang mereka bandar tahun sebuah").split(),
        "et": ("ja on ei oli ning kui ka see tema oma välja olema aasta"
               "linna järgi").split(),
        "lt": ("ir yra kad tai buvo į su kaip metais miesto žmonių taip"
               "pat gali").split(),
        "lv": ("un ir ka tas bija ar kā pilsētas gada cilvēku arī var"
               "tikai").split(),
        "sw": ("na ya wa kwa ni katika la hii watu wake kubwa sana mji"
               "mwaka").split(),
        "tl": ("ang ng sa mga ito ay hindi siya naman para kanyang"
               "lungsod taon").split(),
    }
    rng = _random.Random(99)
    rows = []
    for lang, pool in pools.items():
        for i in range(40):
            text = " ".join(rng.choice(pool) for _ in range(30))
            rows.append((len(rows), text, lang))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": [r[1] for r in rows],
        "lang": [r[2] for r in rows],
    })
    d = tmp_path / "langdocs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    got = lang_trigram(spark, str(d)).collect()
    assert len(got) == len(rows)
    acc = sum(r.lang_guess == r.lang for r in got) / len(got)
    per_lang = {}
    for r in got:
        per_lang.setdefault(r.lang, []).append(r.lang_guess == r.lang)
    detail = {k: round(sum(v) / len(v), 2) for k, v in per_lang.items()}
    assert acc >= 0.98, f"accuracy {acc}: {detail}"


def test_token_bpe_stats_classes(spark, tmp_path):
    """BPE-ish tokenizer classes on text the driver corpus lacks: digit
    runs, punctuation marks, mixed alnum — counted per class, distinct
    over the full token stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.operators.textdata import token_bpe_stats

    texts = ["abc abc 123 45, x-ray!  ", "...", "a1b2"]
    tbl = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                    "text": texts,
                    "lang": ["en"] * 3})
    d = tmp_path / "bpedocs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    got = {r.doc_id: r for r in token_bpe_stats(spark, str(d)).collect()}
    # doc 0: abc abc 123 45 , x - ray !  -> 9 tokens
    r = got[0]
    assert (r.n_tokens, r.n_alpha, r.n_digit, r.n_marks) == (9, 4, 2, 3)
    assert r.n_distinct == 8  # 'abc' repeats
    r = got[1]  # three single-char marks
    assert (r.n_tokens, r.n_alpha, r.n_digit, r.n_marks) == (3, 0, 0, 3)
    assert r.n_distinct == 1
    r = got[2]  # a 1 b 2 — alternating runs
    assert (r.n_tokens, r.n_alpha, r.n_digit, r.n_marks) == (4, 2, 2, 0)


def test_bpe_segment_planted_merges():
    """The merge loop on planted cases: full merges for the vocabulary
    words the table targets, char fallback for out-of-vocabulary text,
    and merge-ALL-occurrences semantics per round."""
    from textextract_spark.operators.textdata import bpe_segment

    assert bpe_segment("the") == ["the"]
    assert bpe_segment("and") == ["and"]
    assert bpe_segment("ing") == ["ing"]
    assert bpe_segment("tion") == ["tion"]
    # merge-all-occurrences: both 'th' merge in round 1, both 'the' next
    assert bpe_segment("thethe") == ["the", "the"]
    # no applicable merges -> chars
    assert bpe_segment("xyz") == ["x", "y", "z"]
    assert bpe_segment("7") == ["7"]
    # partial merge of a corpus word; invariant 1 <= parts <= len(word)
    for w in ("partition", "extraction", "shuffle", "spark"):
        parts = bpe_segment(w)
        assert "".join(parts) == w
        assert 1 <= len(parts) < len(w)


def test_token_bpe_merge_matches_reference(spark, tmp_path):
    """The Arrow UDF path must agree exactly with the pure-Python
    reference (pre-tokenize + bpe_segment over the SAME corpus-learned
    merges table the r6 row applies) on real multi-script text, and
    per-doc counts must respect the BPE bounds."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.operators.textdata import (
        BPE_TOKEN_RE, bpe_segment, learned_bpe_merges, token_bpe_merge)

    texts = [
        "the parting and the ending of the partition",
        "extraction pipelines shuffle partitions, streaming 123 tokens!",
        "abc",
        "তথ্য পাতা লেখা",  # non-ASCII: marks class per pretokenizer
        "no-merges: xyzq 99",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts, "lang": ["en"] * len(texts)})
    d = tmp_path / "bpemerge"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    got = {r.doc_id: r for r in token_bpe_merge(spark, str(d)).collect()}
    merges_t = tuple(learned_bpe_merges(spark, str(d)))
    ranks = {p: i for i, p in enumerate(merges_t)}
    pat = re.compile(BPE_TOKEN_RE)
    for i, t in enumerate(texts):
        pre = pat.findall(t)
        r = got[i]
        assert r.n_pretokens == len(pre)
        assert r.n_bpe_tokens == sum(
            len(bpe_segment(w, merges_t, ranks)) for w in pre)
        assert r.n_pretoken_chars == sum(len(w) for w in pre)
        assert r.n_pretokens <= r.n_bpe_tokens <= r.n_pretoken_chars


def _train_bpe_py(word_freqs: dict, n_merges: int, min_freq: int = 2):
    """Pure-Python BPE trainer oracle: same greedy-left regex merge on
    sentinel-padded symbol strings, same (count desc, pair asc)
    tie-break as textdata.train_bpe_merges."""
    import re

    words = {" " + " ".join(w) + " ": f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for syms, f in words.items():
            parts = syms.split()
            for i in range(len(parts) - 1):
                p = (parts[i], parts[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        if counts[best] < min_freq:
            break
        merges.append(best)
        a, b = best
        pat = re.compile(f"(?<= ){re.escape(a)} {re.escape(b)}(?= )")
        new_words: dict = {}
        for syms, f in words.items():
            new_words[pat.sub(a + b, syms)] = f
        words = new_words
    return merges, words


def test_train_bpe_merges_equals_python_reference(spark, tmp_path):
    """The Spark trainer must learn the IDENTICAL merge list (content
    AND rank order) as the pure-Python reference on a planted corpus —
    including tie-breaks — and applying the learned table through the
    bpe_segment kernel must reproduce the trainer's own final word
    segmentations (the train/apply consistency contract)."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.operators.textdata import (
        BPE_TOKEN_RE, bpe_segment, train_bpe_merges)

    texts = [
        "the theme and the anthem of the partition",
        "parting ending theming streaming 123 tokens, tokens!",
        "aaa aaaa aa a",              # back-to-back pair merges
        "tie tie pie pie",            # count ties -> lexicographic pair
        "তথ্য পাতা লেখা তথ্য",        # non-Latin marks class
    ] * 3  # repetition pushes pairs over min_freq
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts, "lang": ["en"] * len(texts)})
    d = tmp_path / "bpetrain"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    docs = spark.read.parquet(str(d / "documents.parquet"))
    learned = train_bpe_merges(docs, n_merges=24, min_freq=2,
                               checkpoint_every=5)

    pat = re.compile(BPE_TOKEN_RE)
    freqs: dict = {}
    for t in texts:
        for w in pat.findall(t):
            freqs[w] = freqs.get(w, 0) + 1
    expected, final_words = _train_bpe_py(freqs, 24, 2)
    assert learned == expected, (learned, expected)
    assert 0 < len(learned) <= 24

    # train/apply consistency: the kernel with the learned ranks lands
    # on the trainer's own final segmentation for EVERY distinct word
    merges_t = tuple(learned)
    seg_by_word = {syms.replace(" ", ""): syms.split()
                   for syms in final_words}
    for w in freqs:
        assert bpe_segment(w, merges_t) == seg_by_word[w], w


def test_bpe_train_stats_row(spark, tmp_path):
    """The derived-metric row: exact pretoken totals, base alphabet =
    distinct non-ws chars, vocab accounting, and both invariants true."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.operators.textdata import (
        BPE_TOKEN_RE, bpe_train_stats)

    texts = ["the parting and the ending of the partition",
             "partition parting the the the and and ending"] * 4
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts, "lang": ["en"] * len(texts)})
    d = tmp_path / "bpestats"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    r = bpe_train_stats(spark, str(d), n_merges=10).collect()[0]
    pat = re.compile(BPE_TOKEN_RE)
    pre = [w for t in texts for w in pat.findall(t)]
    assert r.total_pretokens == len(pre)
    assert r.total_pretoken_chars == sum(len(w) for w in pre)
    assert r.n_base_chars == len({c for w in pre for c in w})
    assert r.n_merges_learned == 10
    assert r.vocab_size == r.n_base_chars + r.n_merges_learned
    assert r.merged_bounds_ok and r.merges_well_formed
    # the 10-merge request is met, so the trainer did NOT saturate
    assert not r.saturated


def test_repetition_stats_planted(spark, tmp_path):
    """Gopher-style repetition metrics on planted cases: duplicated
    lines, a dominating 2-gram, ellipsis/bullet lines, and a clean doc —
    with the quality label flipping to `repetitive` only on the dup-heavy
    doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.operators.textdata import (
        quality_score, repetition_stats)

    texts = [
        # doc 0: 4 lines, a triplicated line -> dup_line_frac (4-2)/4,
        # char-weighted version counts the 3 copies' chars
        "the same boilerplate line\nthe same boilerplate line\n"
        "the same boilerplate line\nunique closing line",
        # doc 1: dominating 2-gram 'buy now' (5 of 9 words)
        "buy now buy now buy now buy now buy unrelated trailing words",
        # doc 2: ellipsis + bullet lines
        "read more...\n- item one\n- item two\nplain line",
        # doc 3: clean multi-line prose
        "alpha beta gamma\ndelta epsilon zeta\neta theta iota",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts, "lang": ["en"] * len(texts)})
    d = tmp_path / "repdocs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    got = {r.doc_id: r for r in repetition_stats(spark, str(d)).collect()}
    r = got[0]
    assert r.n_lines == 4
    assert r.dup_line_frac == round((4 - 2) / 4, 4)
    # 3 copies x 25 chars duplicated of 3*25+19 total line chars
    assert r.dup_line_char_frac == round(75 / 94, 4)
    r = got[1]
    # 'buy now' appears 4x as a sliding 2-gram; 4 * 7 chars / 60 chars
    assert r.top2gram_char_frac == round(4 * 7 / len(texts[1]), 4)
    r = got[2]
    assert r.ellipsis_line_frac == 0.25
    assert r.bullet_line_frac == 0.5
    r = got[3]
    assert (r.dup_line_frac, r.dup_line_char_frac) == (0.0, 0.0)

    q = {r.doc_id: r.quality for r in quality_score(spark, str(d)).collect()}
    assert q[0] == "repetitive"
    assert q[3] != "repetitive"


def test_duplicate_line_removal_planted(spark):
    """C4-style cross-corpus line dedup on planted cases: a line shared
    across three docs (and twice within one of them) survives only at
    its min-(doc_id, line_no) occurrence; unique lines all survive;
    whitespace-only lines never count."""
    from textextract_spark.operators.textdata import duplicate_line_removal

    docs = spark.createDataFrame(
        [(0, "shared line one\nunique alpha"),
         (1, "shared line one\nunique beta\nshared line one"),
         (2, "unique gamma\n  shared line one  "),
         (3, "\n\nonly line\n")],
        ["doc_id", "text"])
    got = {r.doc_id: r for r in duplicate_line_removal(docs).collect()}

    assert got[0].clean_text == "shared line one\nunique alpha"
    assert (got[0].n_lines, got[0].n_kept, got[0].n_dropped) == (2, 2, 0)
    # doc 1 loses BOTH copies (winner is doc 0's occurrence)
    assert got[1].clean_text == "unique beta"
    assert (got[1].n_lines, got[1].n_kept, got[1].n_dropped) == (3, 1, 2)
    # doc 2's copy is trimmed before matching, then dropped
    assert got[2].clean_text == "unique gamma"
    assert (got[2].n_lines, got[2].n_kept, got[2].n_dropped) == (2, 1, 1)
    # empty lines are not lines
    assert got[3].clean_text == "only line"
    assert (got[3].n_lines, got[3].n_kept, got[3].n_dropped) == (1, 1, 0)


def test_duplicate_line_removal_keeps_whitespace_only_docs(spark):
    """A corpus-cleaning pass must return a verdict for EVERY input row:
    a doc whose text has no non-empty lines (whitespace-only page) comes
    back as (clean_text='', 0, 0, 0), not silently deleted (ADVICE r4 —
    the pre-r5 shape dropped the row entirely)."""
    from textextract_spark.operators.textdata import duplicate_line_removal

    docs = spark.createDataFrame(
        # NB space-only lines: trim() (Spark and DuckDB alike) strips
        # 0x20 only, so a lone tab WOULD count as a line
        [(0, "real line"), (1, "   \n \n  "), (2, ""), (3, "real line")],
        ["doc_id", "text"])
    got = {r.doc_id: r for r in duplicate_line_removal(docs).collect()}
    assert sorted(got) == [0, 1, 2, 3]  # one row per input doc
    for d in (1, 2):
        assert (got[d].clean_text, got[d].n_lines,
                got[d].n_kept, got[d].n_dropped) == ("", 0, 0, 0)
    assert got[0].clean_text == "real line"  # winner
    assert got[3].clean_text == ""           # dup dropped
    assert (got[3].n_lines, got[3].n_kept, got[3].n_dropped) == (1, 0, 1)


def test_dedup_by_canonical_url_custom_id_col(spark):
    """The keeper column is parametrized (ADVICE r4): a pages frame with
    page_id instead of doc_id works, and the latest capture wins."""
    import datetime as dt

    from textextract_spark.operators.urls import dedup_by_canonical_url

    t0 = dt.datetime(2025, 1, 1)
    rows = [(10, "HTTP://Example.COM:80/x/", t0),
            (11, "http://example.com/x", t0 + dt.timedelta(seconds=5)),
            (12, "https://other.example/y", t0)]
    pages = spark.createDataFrame(rows, ["page_id", "url", "warc_ts"])
    got = {r.canonical_url: r
           for r in dedup_by_canonical_url(pages, id_col="page_id")
           .collect()}
    assert got["http://example.com/x"].keeper_doc_id == 11
    assert got["http://example.com/x"].n_captures == 2
    assert got["https://other.example/y"].keeper_doc_id == 12


def test_scrub_pii_edge_cases(spark):
    """PII redaction on boundary cases: punctuation-adjacent emails,
    IP-lookalikes that must survive (version strings inside words),
    ordered scrubbing (the email eats its own digits before the phone
    pattern can)."""
    from pyspark.sql import functions as F

    from textextract_spark.operators.textdata import scrub_pii

    cases = [
        ("mail a.b-c_d@sub.example.co.uk, thanks", "mail <EMAIL>, thanks"),
        ("server 192.168.0.1 and 10.0.0.255.", "server <IP> and <IP>."),
        # embedded in a word: \b keeps v1.2.3.4x from matching... the
        # leading 'v' blocks the left boundary; trailing x blocks right
        ("version v1.2.3.4x ok", "version v1.2.3.4x ok"),
        ("call +4915123456789 now", "call <PHONE> now"),
        ("short +123456 stays", "short +123456 stays"),  # <7 digits
        ("x12345@y.io +1234567", "<EMAIL> <PHONE>"),
        # credit cards: bare, spaced and dashed groupings all redact
        # (scrubbing is pattern-based — Luhn validity is a metric, not
        # a scrub gate, so the Luhn-invalid 1111... goes too)
        ("pay 4242424242424242 ok", "pay <CC> ok"),
        ("pay 4242 4242 4242 4242 ok", "pay <CC> ok"),
        ("pay 4242-4242-4242-4242 ok", "pay <CC> ok"),
        ("pay 1111111111111111 ok", "pay <CC> ok"),
        ("short 424242424242 stays", "short 424242424242 stays"),
        # 17 contiguous digits: \b blocks the 16-digit match inside
        ("long 42424242424242420 stays", "long 42424242424242420 stays"),
        # IBAN: real shape redacts; too-short and lowercase survive
        ("iban DE89370400440532013000 sent",
         "iban <IBAN> sent"),
        ("iban GB29NWBK60161331926819 sent", "iban <IBAN> sent"),
        ("code DE12ABC stays", "code DE12ABC stays"),
        ("de89370400440532013000 stays",
         "de89370400440532013000 stays"),
        # SSN: canonical dashed form redacts; undashed or 3-3-4 (a
        # phone, caught by phone_us) do not leak as SSN
        ("ssn 123-45-6789 filed", "ssn <SSN> filed"),
        ("id 123456789 stays", "id 123456789 stays"),
        ("ssn 1234-45-6789 stays", "ssn 1234-45-6789 stays"),
        # UK NINO shape; lowercase and 8-char forms survive
        ("ni QB123456C sent", "ni <NINO> sent"),
        ("ni qb123456c stays", "ni qb123456c stays"),
        ("ni QB12345C stays", "ni QB12345C stays"),
        # US phones without +: parens, dots, dashes, spaces all redact
        ("call (212) 555-0142 now", "call <PHONE> now"),
        ("call 212.555.0142 now", "call <PHONE> now"),
        ("call 212-555-0142 now", "call <PHONE> now"),
        ("call 212 555 0142 now", "call <PHONE> now"),
        # 3-2-4 dashed is an SSN, not a phone; bare 10 digits survive
        ("call 2125550142 stays", "call 2125550142 stays"),
        # ordered scrub: the SSN pattern wins before phone_us sees it
        ("mix 123-45-6789 x", "mix <SSN> x"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], ["text"])
    got = [r.c for r in
           df.select(scrub_pii(F.col("text")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_pii_luhn_check_digit(spark, tmp_path):
    """The planted card is genuinely Luhn-valid: the in-engine check
    digit matches a from-scratch Python Luhn, and cc_luhn_ok is true
    for every doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.operators.textdata import pii_scrub

    texts = ["alpha beta", "gamma delta", "epsilon"]
    tbl = pa.table({"doc_id": pa.array([0, 7, 123456789], pa.int64()),
                    "text": texts, "lang": ["en"] * 3})
    d = tmp_path / "piidocs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    def luhn_valid(num: str) -> bool:
        s = 0
        for i, ch in enumerate(reversed(num)):
            v = int(ch)
            if i % 2 == 1:
                v *= 2
                if v > 9:
                    v -= 9
            s += v
        return s % 10 == 0

    rows = pii_scrub(spark, str(d)).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_cc == 1 and r.n_iban == 1
        assert r.cc_luhn_ok, r
        assert "<CC>" in r.clean_text and "<IBAN>" in r.clean_text
        assert "4242" not in r.clean_text
    # independent reconstruction of doc 7's planted card: exactly one
    # check digit makes the base Luhn-valid, so cc_luhn_ok being true
    # pins the in-engine digit to this one
    base = "4242" + f"{7:08d}" + "424"
    checks = [c for c in range(10) if luhn_valid(base + str(c))]
    assert len(checks) == 1


def test_winnow_fingerprint_guarantee(spark, tmp_path):
    """The winnowing guarantee (Schleimer et al.): two docs sharing a
    substring of length >= K+W-1 chars share at least one fingerprint;
    fingerprints are whitespace-normalization-invariant; counts obey
    1 <= n_fingerprints <= n_windows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.operators.textdata import winnow_fingerprint

    shared = "the quick brown fox jumps over the lazy dog"
    texts = [
        "prefix alpha " + shared + " suffix beta",
        "totally different opening " + shared,
        "no overlap here at all with anything else whatsoever",
        "  THE   quick brown fox jumps over the lazy dog  ",  # ws/case
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts, "lang": ["en"] * len(texts)})
    d = tmp_path / "windocs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    rows = {r.doc_id: r for r in winnow_fingerprint(spark, str(d)).collect()}
    for r in rows.values():
        assert 1 <= r.n_fingerprints <= r.n_grams - 3
    # docs 0/1 share a 43-char substring -> digests differ but at least
    # one fingerprint is shared; recompute sets via the same operator on
    # the shared text alone
    tbl2 = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "text": [shared], "lang": ["en"]})
    d2 = tmp_path / "winshared"
    d2.mkdir()
    pq.write_table(tbl2, str(d2 / "documents.parquet"))
    # doc 3 is doc-normalized to exactly `shared` (lowercase, collapsed
    # whitespace) -> identical fingerprint digest
    srow = winnow_fingerprint(spark, str(d2)).collect()[0]
    assert rows[3].fp_digest == srow.fp_digest
    assert rows[0].fp_digest != rows[1].fp_digest


def test_canonicalize_url_edge_cases(spark):
    """URL canonicalization on the variants a crawl actually sees:
    casing, default vs explicit ports, fragments, utm params in every
    position, empty/root paths, trailing slashes."""
    from pyspark.sql import functions as F

    from textextract_spark.operators.urls import canonicalize_url

    cases = [
        ("HTTP://Example.COM:80/A/b/", "http://example.com/A/b"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/p#frag", "http://example.com/p"),
        ("http://example.com/p?utm_source=a", "http://example.com/p"),
        ("http://example.com/p?utm_a=1&id=2&utm_b=3&z=4",
         "http://example.com/p?id=2&z=4"),
        ("http://example.com/p?id=2&utm_a=1", "http://example.com/p?id=2"),
        ("http://example.com///", "http://example.com/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r.c for r in
           df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_driver_contract_parity():
    """queries() and oracle_sql() must stay in lockstep: every oracle has
    a query; every query either has an oracle or is on the documented
    rows-only allowlist (each with a pytest oracle elsewhere)."""
    import __spark_entry__ as e

    qs = set(e.queries())
    os_ = set(e.oracle_sql())
    rows_only = {"minhash_neardup", "simhash_neardup", "token_bpe_merge"}
    assert os_ <= qs, f"oracles without queries: {sorted(os_ - qs)}"
    missing = qs - os_ - rows_only
    assert not missing, f"queries without oracle or allowlist: {sorted(missing)}"
    assert rows_only <= qs


def test_decode_media_roundtrip_property():
    """Property: BMP/WAV build->decode is the identity on the header
    parameters across the full parameter ranges (incl. widths needing
    row padding and odd frame sizes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from textextract_spark.operators.multimodal import (
        build_bmp, build_wav, decode_media)

    @settings(max_examples=50, deadline=None)
    @given(w=st.integers(1, 64), h=st.integers(1, 64))
    def check_bmp(w, h):
        f = decode_media(build_bmp(w, h), "image")
        assert (f["width"], f["height"], f["bpp"]) == (w, h, 24)

    @settings(max_examples=50, deadline=None)
    @given(ch=st.integers(1, 2), rate=st.integers(8000, 48000),
           bits=st.sampled_from([8, 16, 32]), n=st.integers(0, 500))
    def check_wav(ch, rate, bits, n):
        f = decode_media(build_wav(ch, rate, bits, n), "audio")
        assert (f["channels"], f["sample_rate"], f["bits"],
                f["n_samples"]) == (ch, rate, bits, n)

    check_bmp()
    check_wav()


def test_curation_operators_idempotent(spark):
    """Curation passes must be idempotent — running any of them twice
    changes nothing (reruns/retries at scale must not mutate data):
    canonicalize(canonicalize(u)) == canonicalize(u),
    scrub(scrub(t)) == scrub(t), and a second duplicate-line-removal
    pass keeps every line the first pass kept."""
    from pyspark.sql import functions as F

    from textextract_spark.operators.textdata import (
        duplicate_line_removal, scrub_pii)
    from textextract_spark.operators.urls import canonicalize_url

    urls = [
        "HTTP://Example.COM:80/a/b/?utm_x=1&id=2#f",
        "https://h.io:8443/p?a=1&utm_b=2&c=3",
        "http://x.org",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(canonicalize_url(F.col("url")).alias("c"))
    twice = once.select(canonicalize_url(F.col("c")).alias("c"))
    assert [r.c for r in once.collect()] == [r.c for r in twice.collect()]

    texts = ["mail a@b.co and 1.2.3.4 call +12345678 end",
             "no pii at all here"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    once = df.select(scrub_pii(F.col("text")).alias("t"))
    twice = once.select(scrub_pii(F.col("t")).alias("t"))
    assert [r.t for r in once.collect()] == [r.t for r in twice.collect()]

    docs = spark.createDataFrame(
        [(0, "shared\nalpha"), (1, "shared\nbeta"), (2, "gamma\nshared")],
        ["doc_id", "text"])
    first = duplicate_line_removal(docs)
    second = duplicate_line_removal(
        first.select("doc_id", F.col("clean_text").alias("text")))
    got1 = {r.doc_id: r.clean_text for r in first.collect()}
    got2 = {r.doc_id: r.clean_text for r in second.collect()}
    assert got1 == got2
    assert all(r.n_dropped == 0 for r in second.collect())


def test_char_lm_perplexity_hand_computed(spark):
    """The bigram LM math on a corpus small enough to verify by hand:
    ref 'ab ab' gives counts {' a':2,'ab':2,'b ':2}, V=3 (a,b,space);
    scoring 'ab' is all-seen (P=3/5 per bigram), 'zz' is all-unseen
    (one 1/5, two 1/3). Cross-entropies must match the closed form and
    the buckets must follow the fixed thresholds."""
    import math

    import pytest as _pytest

    from textextract_spark.operators.textdata import char_lm_perplexity

    ref = spark.createDataFrame([("ab ab",)], ["text"])
    docs = spark.createDataFrame([(0, "ab"), (1, "zz")],
                                 ["doc_id", "text"])
    got = {r.doc_id: r for r in char_lm_perplexity(docs, ref).collect()}

    h_ab = -math.log2(3 / 5)
    assert got[0].n_bigrams == 3
    assert got[0].cross_entropy == _pytest.approx(round(h_ab, 4))
    assert got[0].perplexity == _pytest.approx(2 ** h_ab, abs=1e-3)
    assert got[0].ppl_bucket == "head"

    h_zz = (math.log2(5) + 2 * math.log2(3)) / 3
    assert got[1].cross_entropy == _pytest.approx(round(h_zz, 4))
    assert got[1].perplexity == _pytest.approx(2 ** h_zz, abs=1e-3)
    assert got[1].ppl_bucket == "head"  # 3.56 < PPL_HEAD_MAX


def test_char_lm_ppl_buckets_nonvacuous(spark):
    """The driver row's planted variants must land one per bucket (the
    CCNet decision is exercised, not vacuous): originals head,
    half-reversed middle, fully-reversed tail — with clear margin to
    the fixed thresholds."""
    from pyspark.sql import functions as F

    from textextract_spark.operators.textdata import char_lm_ppl

    df = char_lm_ppl(spark, "/root/testdata/sf0.001")
    grp = (F.when(F.col("doc_id") >= 0, "orig")
           .when(F.col("doc_id") > -2000000, "halfrev")
           .otherwise("rev"))
    rows = (df.groupBy(grp.alias("g"), "ppl_bucket")
            .count().collect())
    by_group = {}
    for r in rows:
        by_group.setdefault(r.g, {})[r.ppl_bucket] = r["count"]
    assert set(by_group["orig"]) == {"head"}
    assert set(by_group["halfrev"]) == {"middle"}
    assert set(by_group["rev"]) == {"tail"}


def test_cap_per_host_exact_two_level_topn(spark):
    """cap_per_host must equal the naive per-host first-N by (ts, id) —
    including across many input partitions (the two-level partial merge
    is exact), on ties, and on hosts under the cap."""
    import datetime as dt

    from textextract_spark.operators.urls import cap_per_host

    t0 = dt.datetime(2025, 1, 1)
    rows = []
    # hot host: 40 docs, interleaved timestamps incl. ties
    for i in range(40):
        rows.append((i, f"https://HOT.example:443/p/{i}",
                     t0 + dt.timedelta(seconds=i % 10)))
    # small host: 2 docs (under cap — all kept)
    rows += [(100, "http://tiny.example/a", t0),
             (101, "http://tiny.example/b", t0)]
    pages = (spark.createDataFrame(rows, ["doc_id", "url", "warc_ts"])
             .repartition(7))  # force multi-partition partials
    got = sorted(r.doc_id for r in cap_per_host(pages, cap=5).collect())

    expect_hot = sorted(
        i for _, i in sorted(
            ((t0 + dt.timedelta(seconds=i % 10), i) for i in range(40)))
        [:5])
    assert got == expect_hot + [100, 101]
    # host column is the lowercased port-stripped authority
    hosts = {r.host for r in cap_per_host(pages, cap=5).collect()}
    assert hosts == {"hot.example", "tiny.example"}


def test_contamination_flags_planted(spark):
    """Decontamination on planted cases: a doc embedding an eval
    sentence is flagged with the exact shared-8-gram count, a 7-word
    overlap stays clean, matching is case/whitespace-insensitive, and
    short docs are trivially clean."""
    from textextract_spark.operators.textdata import contamination_flags

    ev = "the quick brown fox jumps over the lazy dog tonight"  # 10 toks
    docs = spark.createDataFrame(
        [(0, "intro words then " + ev + " trailing stuff"),
         # exactly 7 shared words -> no shared 8-gram
         (1, "the quick brown fox jumps over the city"),
         (2, "  THE  Quick   BROWN fox JUMPS over the LAZY dog tonight"),
         (3, "the quick brown fox"),
         (4, "completely unrelated content about spark and arrow "
             "partitions shuffling nicely")],
        ["doc_id", "text"])
    eval_docs = spark.createDataFrame([(ev,)], ["text"])
    got = {r.doc_id: r for r in
           contamination_flags(docs, eval_docs).collect()}
    assert sorted(got) == [0, 1, 2, 3, 4]
    # eval text has 3 distinct 8-grams; doc 0 contains all of them
    assert (got[0].n_overlap, got[0].contaminated) == (3, True)
    assert (got[1].n_overlap, got[1].contaminated) == (0, False)
    assert (got[2].n_overlap, got[2].contaminated) == (3, True)
    assert (got[3].n_overlap, got[3].contaminated) == (0, False)
    assert (got[4].n_overlap, got[4].contaminated) == (0, False)


def test_temperature_mixture_rates(spark, tmp_path):
    """Temperature sampling math on a planted skewed corpus: the rarest
    language is kept at rate 256/256, rates are monotone decreasing in
    language share, every rate matches the closed form
    floor(256*(n_min/n)^(1-alpha)), and the sampled counts match a
    from-scratch python md5-bucket recomputation."""
    import hashlib
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.operators.textdata import (
        TEMP_ALPHA, temperature_mixture)

    langs = ["en"] * 400 + ["de"] * 80 + ["bn"] * 16
    tbl = pa.table({
        "doc_id": pa.array(range(len(langs)), pa.int64()),
        "text": ["x"] * len(langs),
        "lang": langs,
    })
    d = tmp_path / "tempmix"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    got = {r.lang: r for r in temperature_mixture(spark, str(d)).collect()}
    n = {"en": 400, "de": 80, "bn": 16}
    n_min = 16
    for lang, r in got.items():
        want = min(256, math.floor(
            256 * (n_min / n[lang]) ** (1 - TEMP_ALPHA)))
        assert r.rate_per256 == want, (lang, r.rate_per256, want)
        assert r.n_docs == n[lang]
    assert got["bn"].rate_per256 == 256 and got["bn"].n_sampled == 16
    assert (got["bn"].rate_per256 > got["de"].rate_per256
            > got["en"].rate_per256)

    def bucket(i):
        h = hashlib.md5(str(i).encode()).hexdigest()
        return int(h[0], 16) * 16 + int(h[1], 16)

    start = {"en": 0, "de": 400, "bn": 480}
    for lang, r in got.items():
        expect = sum(1 for i in range(start[lang], start[lang] + n[lang])
                     if bucket(i) < r.rate_per256)
        assert r.n_sampled == expect, lang


def test_filter_blocked_urls_planted(spark):
    """URL blocklist verdicts: banned host (any casing/port), spam path
    keyword (path or query, case-insensitive), clean rows keep, and the
    host column is normalized."""
    from textextract_spark.operators.urls import filter_blocked_urls

    pages = spark.createDataFrame(
        [(0, "https://ok.example/p/1"),
         (1, "https://BAD.example:443/p/2"),
         (2, "https://ok.example/casino/p/3"),
         (3, "https://ok.example/p/4?ref=VIAGRA-deal"),
         (4, "http://bad.example/warez/x")],
        ["doc_id", "url"])
    bl = spark.createDataFrame([("bad.example",)], ["host"])
    got = {r.doc_id: r for r in filter_blocked_urls(pages, bl).collect()}
    assert got[0].keep and not got[0].blocked_host
    assert got[1].blocked_host and not got[1].keep
    assert got[1].host == "bad.example"
    assert got[2].blocked_path and not got[2].keep
    assert got[3].blocked_path  # keyword in the query string
    assert got[4].blocked_host and got[4].blocked_path


def test_duplicated_span_stats_planted(spark):
    """Span-dedup on planted cases: an exact whole-doc copy is fully
    duplicated while the original (canonical min (doc_id, offset))
    stays clean, a shared 128-char boilerplate tail flags only its
    windows, a unique doc is clean, and a doc shorter than one window
    still gets its zero-verdict row."""
    from textextract_spark.operators.textdata import (
        SPAN_K, SPAN_STRIDE, duplicated_span_stats)

    base = ("the corpus analytics engine shuffles partitions across "
            "executors while the optimizer prunes columns and pushes "
            "filters into the scan for every query plan it builds")
    boiler = "x" * (SPAN_K + SPAN_STRIDE)  # spans >= k+stride chars
    docs = spark.createDataFrame(
        [(0, base),                      # original
         (1, base),                      # whole-doc copy
         (2, "completely different words " * 8 + boiler),
         (3, "another unrelated body of text " * 7 + boiler),
         (4, "unique and unshared content that stands alone here "
             "with nothing repeated elsewhere in this tiny corpus ok"),
         (5, "tiny")],                   # < k chars
        ["doc_id", "text"])
    got = {r.doc_id: r for r in duplicated_span_stats(docs).collect()}
    assert sorted(got) == [0, 1, 2, 3, 4, 5]
    # original keeps every window (its offsets are the winners)
    assert got[0].n_dup_windows == 0 and got[0].n_windows > 0
    # the copy is 100% duplicated
    assert got[1].n_dup_windows == got[1].n_windows > 0
    assert got[1].dup_window_frac == 1.0
    # the shared tail flags windows in exactly one of docs 2/3 (the
    # later occurrence), and only partially
    flagged = [d for d in (2, 3) if got[d].n_dup_windows > 0]
    assert len(flagged) == 1
    d = flagged[0]
    assert 0 < got[d].n_dup_windows < got[d].n_windows
    assert got[4].n_dup_windows == 0
    assert (got[5].n_windows, got[5].n_dup_windows,
            got[5].dup_window_frac) == (0, 0, 0.0)


def test_duplicated_span_stats_megadoc_offset_no_alias(spark):
    """Packed-key aliasing regression (r5 judge, what's wrong #3): a
    >1 MB page has char offsets past any fixed pack base, so a packed
    doc_id*K+off winner key collides across docs — here doc 0's window
    at offset 1,000,000 packs to the same key as doc 1's window at
    offset 0. With the two-field (doc_id, off) struct winner the
    canonical is doc 0's occurrence and doc 1 is flagged; the old pack
    made the keys EQUAL so neither occurrence looked duplicated. A
    coarse 50k stride keeps the window count test-sized while the
    offsets stay past the old 1e6 pack base."""
    from textextract_spark.operators.textdata import (
        SPAN_K, duplicated_span_stats)

    shared = "the shared boilerplate window content repeats here!"
    shared = (shared * 3)[:SPAN_K]
    assert len(shared) == SPAN_K
    # doc 0: 1,000,000 filler chars with no repeated window (a monotone
    # counter stream), then the shared window at char offset exactly
    # 1,000,000 (a stride multiple)
    filler = "".join(f"{i:08d}" for i in range(125_000))
    assert len(filler) == 1_000_000
    docs = spark.createDataFrame(
        [(0, filler + shared), (1, shared)], ["doc_id", "text"])
    got = {r.doc_id: r for r in
           duplicated_span_stats(docs, k=SPAN_K, stride=50_000).collect()}
    # doc 1's single window duplicates doc 0's offset-1e6 window, and
    # the canonical min (doc_id, off) occurrence is doc 0's
    assert (got[1].n_windows, got[1].n_dup_windows) == (1, 1)
    # doc 0 keeps ALL its windows: every one is either unique filler or
    # the canonical occurrence of the shared window
    assert got[0].n_dup_windows == 0 and got[0].n_windows == 21


def test_dataset_split_deterministic_partition(spark):
    """The split is a pure function of the id: every doc gets exactly
    one split, proportions land near the configured 246/5/5 buckets,
    and a recomputation (fresh frame, different partitioning) assigns
    identical splits."""
    from textextract_spark.operators.textdata import dataset_split

    ids = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in dataset_split(ids).collect()}
    b = {r.doc_id: r.split
         for r in dataset_split(ids.repartition(13)).collect()}
    assert a == b and len(a) == 5000
    from collections import Counter
    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.93 < c["train"] / 5000 < 0.99
    assert c["val"] / 5000 < 0.04 and c["test"] / 5000 < 0.04


def test_chunk_sequences_stride_semantics(spark):
    """Chunk windows: starts at 0, stride, 2*stride, ... while start < n;
    each chunk holds min(max_tokens, n-start) tokens; adjacent chunks
    share exactly (max-stride) tokens of left context; every token is
    covered; a whitespace-only doc yields ONE empty verdict chunk."""
    from textextract_spark.operators.textdata import chunk_sequences

    toks150 = [f"t{i}" for i in range(150)]
    rows = [(0, " ".join(toks150)),
            (1, "solo"),
            (2, "   \n\t  "),          # whitespace-only
            (3, " ".join(f"x{i}" for i in range(48)))]  # n == stride
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_sequences(docs, max_tokens=64, stride=48).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)

    c0 = sorted(by_doc[0], key=lambda r: r.chunk_id)
    assert [r.start_tok for r in c0] == [0, 48, 96, 144]
    assert [r.chunk_tokens for r in c0] == [64, 64, 54, 6]
    # overlap: chunk k starts 16 tokens before chunk k-1 ends
    w0, w1 = c0[0].chunk_text.split(" "), c0[1].chunk_text.split(" ")
    assert w0[-16:] == w1[:16]
    # full coverage, exact content
    covered = []
    for r in c0:
        covered.extend(r.chunk_text.split(" ")[: 150 - r.start_tok])
    assert set(covered) == set(toks150)
    assert w0 == toks150[:64]

    assert [(r.chunk_id, r.chunk_tokens, r.chunk_text)
            for r in by_doc[1]] == [(0, 1, "solo")]
    assert [(r.chunk_id, r.chunk_tokens, r.chunk_text)
            for r in by_doc[2]] == [(0, 0, "")]
    # n == stride: second window would start at n -> not emitted
    assert [r.start_tok for r in sorted(by_doc[3],
                                        key=lambda r: r.chunk_id)] == [0]


def test_bigram_pmi_hand_computed(spark, tmp_path):
    """PMI values against a pure-Python recount on a planted corpus:
    'new york' is a tight collocation (high PMI), 'the the' a loose
    one; min_count filters the singletons."""
    import math as _math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.operators.textdata import bigram_pmi

    texts = ["new york " * 4 + "the cat sat on the mat",
             "the dog and the cat saw new york",
             "one two three four five six seven"]
    tbl = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                    "text": texts,
                    "lang": ["en"] * 3})
    d = tmp_path / "pmidocs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    got = {(r.w1, r.w2): r
           for r in bigram_pmi(spark, str(d), min_count=2,
                               top_k=50).collect()}

    # pure-Python recount with identical tokenization
    import re as _re
    uni: dict = {}
    bi: dict = {}
    for t in texts:
        ws = _re.findall("[a-z]+", t.lower())
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    t1 = sum(uni.values())
    t2 = sum(bi.values())
    expect = {k: round(_math.log((c / t2) / ((uni[k[0]] / t1)
                                             * (uni[k[1]] / t1))), 4)
              for k, c in bi.items() if c >= 2}
    assert set(got) == set(expect)
    for k, pmi in expect.items():
        assert abs(got[k].pmi - pmi) < 1e-9, (k, got[k].pmi, pmi)
        assert got[k].n_pair == bi[k]
    assert got[("new", "york")].n_w1 == uni["new"]


def test_outlinks_and_link_graph(spark):
    """href extraction: absolute http(s) links only (relative nav and
    non-http schemes excluded), hosts lowercased, ports stripped;
    the edge aggregation counts links and distinct source pages."""
    from textextract_spark.operators.urls import (
        extract_outlinks, host_link_graph)

    def page(url, body):
        return (url, bytearray(body.encode("utf-8")))

    rows = [
        page("https://A.example/p/1",
             '<a href="/rel">r</a><a href="https://B.Example:443/x">b</a>'
             '<a href="mailto:x@y.z">m</a>'
             '<a href="http://c.example/y">c</a>'),
        page("https://a.example/p/2",
             '<a href="https://b.example/z">b2</a>'),
        page("https://d.example/q", "<p>no links</p>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    links = extract_outlinks(pages).collect()
    assert sorted((r.src_host, r.dst_host) for r in links) == [
        ("a.example", "b.example"), ("a.example", "b.example"),
        ("a.example", "c.example")]
    edges = {(r.src_host, r.dst_host): r
             for r in host_link_graph(pages).collect()}
    assert edges[("a.example", "b.example")].n_links == 2
    assert edges[("a.example", "b.example")].n_src_pages == 2
    assert edges[("a.example", "c.example")].n_links == 1
    assert len(edges) == 2  # linkless page contributes no edge


def test_pagerank_hosts_reference(spark):
    """3-iteration PageRank against a pure-Python reference on a small
    cyclic graph (a->b->c->a plus a dangling sink d)."""
    from textextract_spark.operators.urls import pagerank_hosts

    raw = [("a", "b", 2), ("a", "d", 1), ("b", "c", 1), ("c", "a", 1)]
    edges = spark.createDataFrame(
        [(s, t, n, 1) for s, t, n in raw],
        "src_host string, dst_host string, n_links long, n_src_pages long")
    got = {r.host: r.rank for r in pagerank_hosts(edges).collect()}

    out = {}
    for s, _, n in raw:
        out[s] = out.get(s, 0) + n
    nodes = {s for s, _, _ in raw} | {t for _, t, _ in raw}
    # the r6 exact micro-unit schedule: per-edge contributions are
    # re-quantized, per-node sums are exact integers. Half-up rounding
    # (floor(x + .5) on the positive values here) — Python's round()
    # is banker's and would diverge from Spark/DuckDB on a .5 boundary
    import math as _m

    def r_half_up(x):
        return _m.floor(x + 0.5)

    rank = {v: 1_000_000 for v in nodes}
    for _ in range(3):
        contrib = {v: 0 for v in nodes}
        for s, t, n in raw:
            contrib[t] += r_half_up(rank[s] * n / out[s])
        rank = {v: 150_000 + r_half_up(0.85 * contrib[v])
                for v in nodes}
    assert set(got) == nodes
    for v in nodes:
        assert got[v] == round(rank[v] / 1_000_000, 4), (v, got[v])
    # dangling sink d keeps only what flows in; no rank is invented
    assert got["d"] < got["b"]


def test_bm25_hand_computed(spark):
    """BM25 scores against a pure-Python recount on a planted corpus:
    idf (Lucene form), length normalization, zero-token doc counted in
    N/avgdl but never matching, top-k cut by (score desc, doc_id)."""
    import math as _math
    import re as _re

    from textextract_spark.operators.ranking import bm25_search

    texts = ["spark spark stream merge",
             "merge of the day",
             "vector vector vector spark stream stream",
             "nothing relevant here at all today",
             "   "]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    q = ("spark", "merge", "vector", "stream")
    got = {r.doc_id: r for r in bm25_search(docs, q, top_k=3).collect()}

    tok = [_re.findall("[a-z]+", t.lower()) for t in texts]
    n = len(texts)
    avgdl = sum(len(w) for w in tok) / n
    df = {t: sum(1 for w in tok if t in w) for t in q}
    k1, b = 1.2, 0.75
    expect = {}
    for d, ws in enumerate(tok):
        s, hits = 0.0, 0
        for t in q:
            tf = ws.count(t)
            if not tf or not df[t]:
                continue
            hits += 1
            idf = _math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += (idf * tf * (k1 + 1)
                  / (tf + k1 * (1 - b + b * len(ws) / avgdl)))
        if hits:
            expect[d] = (round(s, 4), hits)
    top3 = sorted(expect.items(), key=lambda kv: (-kv[1][0], kv[0]))[:3]
    assert set(got) == {d for d, _ in top3}
    for d, (s, hits) in top3:
        assert abs(got[d].score - s) < 1e-9, (d, got[d].score, s)
        assert got[d].n_terms == hits
    assert 3 not in got and 4 not in got  # no-match and empty docs


def test_tfidf_keywords_hand_computed(spark):
    """Per-doc top-3 TF-IDF against a pure-Python recount: rounded-4
    selection, term-asc tie break, ubiquitous term scores 0, zero-token
    doc emits no rows."""
    import math as _math
    import re as _re

    from textextract_spark.operators.ranking import tfidf_doc_keywords

    texts = ["apple apple banana common",
             "banana cherry cherry common",
             "apple cherry durian common",
             "\t \n"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    out = tfidf_doc_keywords(docs).collect()

    tok = [_re.findall("[a-z]+", t.lower()) for t in texts]
    n = len(texts)
    vocab = {w for ws in tok for w in ws}
    df = {t: sum(1 for ws in tok if t in ws) for t in vocab}
    expect = {}
    for d, ws in enumerate(tok):
        scored = sorted(
            ((round(ws.count(t) * _math.log(n / df[t]), 4), t)
             for t in set(ws)),
            key=lambda st: (-st[0], st[1]))[:3]
        for rk, (s, t) in enumerate(scored, 1):
            expect[(d, rk)] = (t, s)
    got = {(r.doc_id, r.rk): (r.term, r.tfidf) for r in out}
    assert set(got) == set(expect)
    for k, (t, s) in expect.items():
        assert got[k][0] == t, (k, got[k], t)
        assert abs(got[k][1] - s) < 1e-9
    # 'common' appears in every non-empty doc of the 4-doc corpus:
    # idf = ln(4/3) > 0, but it must lose to any doc-specific term
    assert all(t != "common" or rk == 3
               for (_, rk), (t, _) in expect.items())


def test_word_bucket_portable_hash(spark):
    """The Horner word-feature hash is identical in Spark and DuckDB —
    the foundation of every learned-curation twin."""
    import duckdb

    from pyspark.sql import functions as F

    from textextract_spark.operators.learned import HASH_MOD, _bucket

    words = ["spark", "query", "a", "customer", "window", "dup",
             "zzz", "q"]
    sdf = spark.createDataFrame([(w,) for w in words], "w string")
    got_spark = {r.w: r.b for r in sdf.select(
        "w", _bucket("w", 64).alias("b")).collect()}
    con = duckdb.connect()
    got_duck = dict(con.execute(f"""
        SELECT w, CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, length(w) + 1),
                   i -> CAST(unicode(substr(w, CAST(i AS INT), 1))
                        AS BIGINT))),
                 (a, c) -> (a * 31 + c) % {HASH_MOD}) % 64 AS INT)
        FROM (SELECT unnest(?) AS w)""", [words]).fetchall())
    assert got_spark == got_duck
    # pure-Python reference of the same fold
    for w in words:
        a = 0
        for ch in w:
            a = (a * 31 + ord(ch)) % HASH_MOD
        assert got_spark[w] == a % 64


def test_dsir_upweights_target_slice(spark):
    """On a corpus where the target slice uses distinct vocabulary,
    target-looking docs get positive avg_log_ratio, off-target docs
    negative, and a zero-token doc gets a neutral 0.0 verdict (every
    input row is scored)."""
    from pyspark.sql import functions as F

    from textextract_spark.operators.learned import dsir_doc_weights

    rows = ([(i, "alpha beta gamma delta epsilon", "tgt")
             for i in range(20)]
            + [(100 + i, "omega sigma tau phi chi", "raw")
               for i in range(20)]
            + [(999, "   ", "raw")])
    docs = spark.createDataFrame(rows, "doc_id long, text string,"
                                       " lang string")
    out = {r.doc_id: r for r in dsir_doc_weights(
        docs, F.col("lang") == "tgt").collect()}
    assert len(out) == 41
    assert out[0].avg_log_ratio > 0.3
    assert out[100].avg_log_ratio < -0.3
    assert out[999].avg_log_ratio == 0.0 and out[999].n_tokens == 0
    # weights are identical within each slice (same token multiset)
    assert out[5].avg_log_ratio == out[0].avg_log_ratio
    assert out[105].avg_log_ratio == out[100].avg_log_ratio


def test_lr_train_matches_fixed_point_reference(spark):
    """lr_train reproduces a pure-Python implementation of the same
    integer fixed-point schedule EXACTLY (int equality on every
    weight), and learns a planted marker rule on a separable corpus:
    the marker's bucket carries the most positive weight and training
    accuracy is >= 0.95 with both classes predicted."""
    import math as _math
    import re as _re

    from textextract_spark.operators.learned import (
        HASH_MOD, LR_ITERS, LR_POS_WORDS, LR_RATE, LR_SCALE, _scores6,
        lr_train)

    B = 64
    marker = LR_POS_WORDS[0]
    rows = []
    for i in range(60):
        body = f"alpha beta w{i % 7} gamma"
        if i % 5 == 0:
            body += f" {marker}"
        rows.append((i, body))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    w6, labels, feats_i, n = lr_train(docs, buckets=B)

    def bucket(w):
        a = 0
        for ch in w:
            a = (a * 31 + ord(ch)) % HASH_MOD
        return a % B

    def away(x):
        return (_math.floor(x + 0.5) if x >= 0
                else _math.ceil(x - 0.5))

    feats = []
    ys = []
    for _i, text in rows:
        ws = set(_re.findall("[a-z]+", text.lower()))
        feats.append(sorted({bucket(w) for w in ws}))
        ys.append(1 if marker in ws else 0)
    ref = {bk: 0 for bk in range(-1, B)}
    for _ in range(LR_ITERS):
        gsum = {bk: 0 for bk in range(-1, B)}
        for d in range(len(rows)):
            s6 = ref[-1] + sum(ref[bk] for bk in feats[d])
            p6 = away(LR_SCALE / (1 + _math.exp(-s6 / LR_SCALE)))
            gn = p6 - ys[d] * LR_SCALE
            gsum[-1] += gn
            for bk in feats[d]:
                gsum[bk] += gn
        for bk in ref:
            ref[bk] -= LR_RATE * away(gsum[bk] / len(rows))
    assert w6 == ref  # exact integer equality, every weight

    mb = bucket(marker)
    assert w6[mb] == max(w6.values())
    preds = {r["doc_id"]: r["__score6"] >= 0
             for r in _scores6(w6, labels, feats_i)
             .collect()}
    acc = sum(preds[i] == bool(y)
              for (i, _), y in zip(rows, ys)) / len(rows)
    assert acc >= 0.95
    assert any(preds.values()) and not all(preds.values())


def test_robots_parse_and_verdicts(spark):
    """robots.txt semantics on planted cases: star-group scoping (other
    agents' rules ignored), longest-prefix match, Allow wins length
    ties, empty Disallow value dropped (allow-all idiom), hosts with no
    star group or no robots at all allow everything, directory vs file
    prefixes, root path fallback."""
    from textextract_spark.operators.urls import (
        parse_robots_star, robots_allowed)

    robots = spark.createDataFrame([
        ("a.example",
         "User-agent: badbot\nDisallow: /\n\n"
         "user-agent: *\nDisallow: /private\nAllow: /private/ok\n"
         "Disallow: /tmp/\n\nUser-agent: other\nDisallow: /elsewhere\n"),
        ("b.example", "User-agent: *\nDisallow:\n"),
        ("c.example", "User-agent: badbot\nDisallow: /\n"),
        # stacked header (badbot + * share a group) AND a second star
        # group later: both merge into the star rule set (RFC 9309)
        ("e.example",
         "User-agent: badbot\nUser-agent: *\nDisallow: /private\n\n"
         "User-agent: other\nDisallow: /x\n\n"
         "User-agent: *\nDisallow: /tmp/\n"),
        # wildcard + $ anchor rules
        ("f.example",
         "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp/*\n"
         "Allow: /tmp/ok*\n"),
        # crawl-delay: two merged star groups (min wins), junk value
        # ignored, badbot's delay never leaks into the star set
        ("g.example",
         "User-agent: badbot\nCrawl-delay: 99\n\n"
         "User-agent: *\nCrawl-delay: 10\nCrawl-delay: soon\n\n"
         "User-agent: *\nDisallow: /x\nCrawl-delay: 2.5\n"),
    ], "host string, robots_txt string")
    rules = {r.host: r for r in parse_robots_star(robots).collect()}
    assert rules["a.example"].disallow_prefixes == ["/private", "/tmp/"]
    assert rules["a.example"].allow_prefixes == ["/private/ok"]
    assert rules["b.example"].disallow_prefixes == []
    assert rules["c.example"].disallow_prefixes == []
    assert rules["c.example"].allow_prefixes == []
    assert rules["e.example"].disallow_prefixes == ["/private", "/tmp/"]
    assert rules["f.example"].disallow_prefixes == ["/*.pdf$", "/tmp/*"]
    # Crawl-delay: min across merged star groups; non-numeric ignored;
    # none declared (or only in other agents' groups) -> NULL
    assert rules["g.example"].crawl_delay == 2.5
    assert rules["a.example"].crawl_delay is None
    assert rules["c.example"].crawl_delay is None

    urls = spark.createDataFrame([
        (0, "https://a.example/p/1"),          # no rule matches
        (1, "https://a.example/private/x"),    # disallowed (8)
        (2, "https://a.example/private/ok/y"), # allow 11 beats dis 8
        (3, "https://a.example/tmp/z"),        # dir prefix blocks
        (4, "https://a.example/tmpfile"),      # /tmp/ does NOT match
        (5, "https://a.example"),              # bare root -> '/'
        (6, "https://b.example/private/x"),    # empty Disallow -> allow
        (7, "https://c.example/anything"),     # no star group
        (8, "https://d.example/x"),            # no robots row at all
        (9, "https://e.example/private/x"),    # stacked-header rule
        (10, "https://e.example/tmp/z"),       # merged 2nd star group
        (11, "https://f.example/doc.pdf"),     # $ anchor bites
        (12, "https://f.example/doc.pdfx"),    # anchored -> no match
        (13, "https://f.example/tmp/zz"),      # /tmp/* blocks
        (14, "https://f.example/tmp/ok1"),     # allow 8 beats dis 6
    ], "doc_id long, url string")
    out = {r.doc_id: r for r in robots_allowed(
        urls, parse_robots_star(robots)).collect()}
    assert [out[i].allowed for i in range(15)] == [
        True, False, True, False, True, True, True, True, True,
        False, False, False, True, False, True]
    assert out[1].best_disallow == 8 and out[1].best_allow == -1
    assert out[2].best_allow == 11 and out[2].best_disallow == 8
    assert out[5].path == "/"
    assert out[8].best_allow == -1 and out[8].best_disallow == -1
    # pattern-length precedence counts the raw value incl. * and $
    assert out[11].best_disallow == 7
    assert out[14].best_allow == 8 and out[14].best_disallow == 6


def test_inbound_anchor_terms(spark):
    """Anchor-text aggregation: words come from the LINKING page's
    anchor text, attributed to the TARGET host; relative links are
    excluded; top-k per host breaks ties on term asc."""
    from textextract_spark.operators.urls import inbound_anchor_terms

    def page(url, body):
        return (url, bytearray(body.encode("utf-8")))

    rows = [
        page("https://a.example/1",
             '<a href="https://t.example/x">best spark guide</a>'
             '<a href="/rel">local nav</a>'
             '<a href="https://t.example/y">spark tips</a>'),
        page("https://b.example/2",
             '<a href="https://t.example/z">spark guide</a>'
             '<a href="https://u.example/q">zebra zebra alpha</a>'),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = {(r.dst_host, r.rk): (r.term, r.n)
           for r in inbound_anchor_terms(pages).collect()}
    # t.example: spark x3, guide x2, best/tips x1 (tie -> best first)
    assert out[("t.example", 1)] == ("spark", 3)
    assert out[("t.example", 2)] == ("guide", 2)
    assert out[("t.example", 3)] == ("best", 1)
    assert out[("u.example", 1)] == ("zebra", 2)
    assert out[("u.example", 2)] == ("alpha", 1)
    assert ("u.example", 3) not in out
    assert not any(h == "a.example" or h == "rel"
                   for h, _ in out)  # relative link never attributed


def test_snapshot_diff_statuses(spark):
    """Snapshot diff: all four statuses from a hand-built pair of
    cycles; digests carried through; urls unique."""
    from textextract_spark.operators.urls import snapshot_diff

    old = spark.createDataFrame(
        [("u://a", "d1"), ("u://b", "d2"), ("u://c", "d3")],
        "url string, digest string")
    new = spark.createDataFrame(
        [("u://a", "d1"), ("u://b", "dX"), ("u://d", "d4")],
        "url string, digest string")
    out = {r.url: r for r in snapshot_diff(old, new).collect()}
    assert out["u://a"].status == "unchanged"
    assert out["u://b"].status == "changed"
    assert out["u://b"].old_digest == "d2"
    assert out["u://b"].new_digest == "dX"
    assert out["u://c"].status == "removed"
    assert out["u://c"].new_digest == ""
    assert out["u://d"].status == "added"
    assert out["u://d"].old_digest == ""
    assert len(out) == 4


def test_robots_parse_fuzz_vs_reference(spark):
    """Seeded fuzz: 150 randomized robots.txt bodies (multiple agent
    groups in random order, STACKED User-agent runs, case-noise on
    directive names, blank lines, comments, junk, empty values,
    wildcard/$ rule values) parsed in ONE Spark job must match a
    pure-Python reference implementing the RFC 9309 group model line
    for line: a header is a maximal consecutive User-agent run, a rule
    is star-governed iff its governing run names '*', and all star
    groups merge in line order."""
    import random

    from textextract_spark.operators.urls import parse_robots_star

    rng = random.Random(7)
    agents = ["*", "badbot", "goodbot", "Mozilla"]
    paths = ["/", "/a", "/private", "/tmp/", "/deep/path/x", "",
             "/*.pdf$", "/x*y", "/end$"]

    def mk_line():
        r = rng.random()
        if r < 0.25:
            ua = rng.choice(["User-agent:", "user-agent:", "USER-AGENT:"])
            return f"{ua} {rng.choice(agents)}"
        if r < 0.5:
            d = rng.choice(["Disallow:", "disallow:", "DisAllow:"])
            return f"{d} {rng.choice(paths)}"
        if r < 0.65:
            a = rng.choice(["Allow:", "allow:"])
            return f"{a} {rng.choice(paths)}"
        if r < 0.75:
            return ""
        if r < 0.85:
            return "# a comment line"
        return rng.choice(["Sitemap: https://x.example/s.xml",
                           "Crawl-delay: 10", "garbage line"])

    bodies = ["\n".join(mk_line() for _ in range(rng.randint(0, 25)))
              for _ in range(150)]

    def ref(body):
        ls = [x.strip() for x in body.split("\n")]
        ua = set(i for i, x in enumerate(ls)
                 if x.lower().startswith("user-agent:"))
        al, dis = [], []
        for i, x in enumerate(ls):
            low = x.lower()
            is_al = low.startswith("allow:")
            is_dis = low.startswith("disallow:")
            if not (is_al or is_dis):
                continue
            prev = [u for u in ua if u < i]
            if not prev:
                continue
            p = max(prev)          # last header line before the rule
            r = p
            while r - 1 in ua:     # walk to the run's first line
                r -= 1
            if not any(ls[u][11:].strip() == "*"
                       for u in range(r, p + 1)):
                continue
            if is_al:
                al.append(x[6:].strip())
            elif x[9:].strip() != "":
                dis.append(x[9:].strip())
        return al, dis

    robots = spark.createDataFrame(
        [(str(i), b) for i, b in enumerate(bodies)],
        "host string, robots_txt string")
    got = {r.host: (r.allow_prefixes, r.disallow_prefixes)
           for r in parse_robots_star(robots).collect()}
    assert len(got) == 150
    for i, b in enumerate(bodies):
        al, dis = ref(b)
        assert got[str(i)] == (al, dis), (i, b, got[str(i)], (al, dis))


def test_kmeans_integer_reference(spark, tmp_path):
    """kmeans_fit reproduces a pure-Python implementation of the same
    integer Lloyd schedule EXACTLY (int equality on every centroid
    component), separates three planted groups, and an unmatched
    init centroid (K > natural clusters) keeps its previous position
    instead of degenerating."""
    import math as _math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.operators.learned import (
        KMEANS_SCALE, _assign, kmeans_fit)

    groups = [[0.9, 0.1, 0.0, 0.0], [0.0, 0.9, 0.1, 0.0],
              [0.0, 0.0, 0.1, 0.9]]
    vecs = []
    for i in range(30):
        g = groups[i % 3]
        vecs.append([c + 0.01 * ((i * 7 + d) % 5 - 2)
                     for d, c in enumerate(g)])
    # vec 30: an outlier that seeds centroid 3 and keeps it non-empty
    vecs.append([5.0, 5.0, 5.0, 5.0])
    tbl = pa.table({
        "vec_id": pa.array(range(31), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in range(31)], pa.int32())})
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(tbl, str(d / "embeddings.parquet"))

    K, ITERS = 4, 3
    cents, qv = kmeans_fit(spark, str(d), k=K, n_iter=ITERS)

    def away(x):
        return (_math.floor(x + 0.5) if x >= 0
                else _math.ceil(x - 0.5))

    import numpy as np
    f32 = [list(np.array(v, dtype=np.float32)) for v in vecs]
    q = [[away(float(x) * KMEANS_SCALE) for x in v] for v in f32]
    ref = {kk: list(q[kk]) for kk in range(K)}
    for _ in range(ITERS):
        assign = {}
        for vid, vq in enumerate(q):
            dists = [(sum((a - b) ** 2 for a, b in zip(vq, ref[kk])),
                      kk) for kk in range(K)]
            assign[vid] = min(dists)[1]
        for kk in range(K):
            members = [q[v] for v, a in assign.items() if a == kk]
            if members:
                ref[kk] = [away(sum(col) / len(members))
                           for col in zip(*members)]
    assert cents == ref  # exact integer equality, every component

    got = {r["vec_id"]: r["__k"]
           for r in _assign(qv, cents).select("vec_id", "__k").collect()}
    # the three planted groups land in three distinct clusters
    c_of_group = [got[0], got[1], got[2]]
    assert len(set(c_of_group)) == 3
    for i in range(30):
        assert got[i] == c_of_group[i % 3], i
    # the outlier sits alone in the fourth cluster
    assert got[30] not in c_of_group


def test_cluster_balanced_sample_rates(spark):
    """The balancing rule itself: rate256 = min(256, floor(256*T/n)) —
    a cluster at-or-under target keeps everything (rate 256), a 4x
    oversized cluster gets ~a quarter, and n_kept <= n_vecs with the
    kept set determined solely by md5(vec_id)."""
    from textextract_spark.operators.learned import (
        BALANCE_TARGET, cluster_balanced_sample)

    out = {r.cluster: r for r in cluster_balanced_sample(
        spark, "/root/testdata/sf0.001").collect()}
    assert out  # at least one cluster
    for r in out.values():
        expect_rate = min(256, (256 * BALANCE_TARGET) // r.n_vecs)
        assert r.rate256 == expect_rate, r
        assert 0 <= r.n_kept <= r.n_vecs
        if r.n_vecs <= BALANCE_TARGET:
            assert r.rate256 == 256 and r.n_kept == r.n_vecs


def test_host_degrees_hand_graph(spark):
    """Degree summary on a hand graph: pure sources, pure sinks, and a
    both-sides host all appear with exact counts."""
    from textextract_spark.operators.urls import host_degrees

    edges = spark.createDataFrame(
        [("a", "b", 3, 1), ("a", "c", 1, 1), ("b", "c", 2, 1)],
        "src_host string, dst_host string, n_links long,"
        " n_src_pages long")
    got = {r.host: r for r in host_degrees(edges).collect()}
    assert (got["a"].out_degree, got["a"].in_degree,
            got["a"].n_out_links, got["a"].n_in_links) == (2, 0, 4, 0)
    assert (got["b"].out_degree, got["b"].in_degree,
            got["b"].n_out_links, got["b"].n_in_links) == (1, 1, 2, 3)
    assert (got["c"].out_degree, got["c"].in_degree) == (0, 2)
    assert got["c"].n_in_links == 3


def test_pack_training_sequences_matches_python_packer(spark):
    """Packing on a planted chunk stream: global offsets, pack indexes,
    in-pack offsets and straddle spans must equal a pure-Python
    concat-and-split reference within each bucket, and empty chunks
    span zero packs."""
    import hashlib

    from textextract_spark.operators.textdata import (
        pack_training_sequences)

    rows = []
    for doc in range(12):
        for c in range(doc % 4 + 1):
            rows.append((doc, c, (doc * 7 + c * 3) % 11))  # some zeros
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_id int, chunk_tokens int")
    budget = 10
    got = {(r.doc_id, r.chunk_id): r for r in
           pack_training_sequences(chunks, budget=budget).collect()}

    def bucket(doc):
        h = hashlib.md5(str(doc).encode()).hexdigest()
        return int(h[0], 16) * 16 + int(h[1], 16)

    streams = {}
    for doc, c, n in sorted(rows):
        b = bucket(doc)
        start = streams.get(b, 0)
        streams[b] = start + n
        r = got[(doc, c)]
        assert r.bucket == b
        assert r.start_off == start
        assert r.pack_first == start // budget
        assert r.off_in_pack == start % budget
        want_span = 0 if n == 0 else (start + n - 1) // budget \
            - start // budget + 1
        assert r.n_packs_spanned == want_span, (doc, c, n, start)


def test_domain_mixture_budget_plan(spark):
    """Mixture plan on hand numbers: an up-weighted tiny domain repeats
    (full epochs + fractional rate), the epoch cap binds, a domain
    absent from the weight table plans zero tokens."""
    from textextract_spark.operators.textdata import domain_mixture_budget

    rows = ([(f"doc {i} with six tokens here", "en")
             for i in range(100)]           # 100 docs x 6 toks = 600
            + [("tiny corpus", "xx")] * 5   # 10 tokens, weight 0.5
            + [("unlisted words", "yy")])   # no weight row
    docs = spark.createDataFrame(rows, "text string, lang string")
    got = {r.lang: r for r in domain_mixture_budget(
        docs, weights=(("en", 0.5), ("xx", 0.5)), budget=1000).collect()}
    en = got["en"]
    assert (en.n_tokens, en.target_tokens) == (600, 500)
    # 500/600 epochs -> 0 full, floor(0.8333*256)=213 frac
    assert (en.full_epochs, en.frac_rate256) == (0, 213)
    assert en.planned_tokens == 600 * 213 // 256
    xx = got["xx"]
    # 500/10 = 50 epochs, capped at 4: full 4, frac 0
    assert (xx.full_epochs, xx.frac_rate256) == (4, 0)
    assert xx.planned_tokens == 40
    yy = got["yy"]
    assert (yy.target_frac, yy.target_tokens, yy.planned_tokens) \
        == (0.0, 0, 0)


def test_gopher_rules_planted(spark):
    """Each Gopher rule fires on its planted breaker and only there;
    hand-recomputed signal values match; the empty doc keeps its
    verdict row."""
    from textextract_spark.operators.textdata import gopher_rules

    good = ("the engine reads pages from the crawl and extracts the "
            "main content that users want to keep with careful scoring "
            "of every block so the boilerplate disappears and clean "
            "text survives to be used for training models that have "
            "good quality and consistent length in all of the many "
            "cases that matter")
    rows = [
        (0, good),                                      # passes all
        (1, "too short but the and of that be with"),   # word count
        (2, " ".join(["supercalifragilistic"] * 60)
            + " the of and"),                           # mean len high
        (3, good + " " + "#" * 1 + (" #" * 30)),        # symbol ratio
        (4, " ".join(["123"] * 60) + " the of and"),    # alpha frac
        (5, " ".join(["alpha", "bravo"] * 30)),         # stopwords
        (6, ""),                                        # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert got[0].gopher_pass
    assert not got[1].ok_word_count and got[1].ok_stopwords
    assert not got[2].ok_mean_len
    assert not got[3].ok_symbol_ratio and got[3].ok_word_count
    assert not got[4].ok_alpha
    assert not got[5].ok_stopwords and got[5].ok_alpha
    assert (got[6].n_words, got[6].gopher_pass) == (0, False)
    # hand-check one signal set
    ws = rows[4][1].split()
    assert got[4].n_words == len(ws)
    assert got[4].alpha_word_frac == round(3 / len(ws), 4)
    assert not any(r.gopher_pass for r in got.values() if r.doc_id != 0)


def test_parse_sitemaps_group_independent(spark):
    """Sitemap: lines apply regardless of User-agent sections — above
    groups, inside other agents' groups, and inside the star group all
    collect, in file order; empty values drop; hosts without a line
    get an empty list."""
    from textextract_spark.operators.urls import parse_sitemaps

    robots = spark.createDataFrame([
        ("a.example",
         "Sitemap: https://a.example/top.xml\n"
         "User-agent: badbot\nDisallow: /\n"
         "sitemap: https://a.example/inner.xml\n"
         "User-agent: *\nDisallow: /x\n"
         "SITEMAP: https://cdn.example/star.xml\nSitemap:\n"),
        ("b.example", "User-agent: *\nDisallow:\n"),
    ], "host string, robots_txt string")
    got = {r.host: r.sitemaps for r in parse_sitemaps(robots).collect()}
    assert got["a.example"] == ["https://a.example/top.xml",
                                "https://a.example/inner.xml",
                                "https://cdn.example/star.xml"]
    assert got["b.example"] == []


def test_recrawl_priority_buckets(spark):
    """Priority buckets on a hand-built diff: an all-churn host goes
    high, a mildly-changing one medium, a static one low; counts and
    rates recomputed by hand."""
    from textextract_spark.operators.urls import recrawl_priority

    rows = (
        [("https://hot.example/p/%d" % i, "changed") for i in range(6)]
        + [("https://hot.example/p/x", "added")]
        + [("https://mid.example/p/%d" % i, "unchanged")
           for i in range(8)]
        + [("https://mid.example/p/8", "removed")]
        + [("https://cold.example/p/%d" % i, "unchanged")
           for i in range(5)])
    diff = spark.createDataFrame(rows, "url string, status string")
    got = {r.host: r for r in recrawl_priority(diff).collect()}
    hot = got["hot.example"]
    assert (hot.n_urls, hot.n_changed, hot.n_added) == (7, 6, 1)
    assert (hot.change_rate, hot.priority) == (1.0, "high")
    mid = got["mid.example"]
    assert (mid.n_removed, mid.change_rate, mid.priority) \
        == (1, round(1 / 9, 4), "medium")
    assert (got["cold.example"].change_rate,
            got["cold.example"].priority) == (0.0, "low")


def test_pack_sequences_text_matches_python(spark):
    """The materialized packs must equal a pure-Python concat-and-split
    of each bucket's chunk token stream: byte-identical text, exact
    budget-sized packs except each bucket's last."""
    import hashlib

    from textextract_spark.operators.textdata import pack_sequences_text

    rows = []
    for doc in range(15):
        for c in range(doc % 3 + 1):
            toks = [f"w{doc}_{c}_{i}" for i in range((doc * 5 + c) % 9)]
            rows.append((doc, c, " ".join(toks)))
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_id int, chunk_text string")
    budget = 7
    got = {(r.bucket, r.pack): r for r in
           pack_sequences_text(chunks, budget=budget).collect()}

    def bucket(doc):
        h = hashlib.md5(str(doc).encode()).hexdigest()
        return int(h[0], 16) * 16 + int(h[1], 16)

    streams: dict = {}
    for doc, c, text in sorted(rows):
        streams.setdefault(bucket(doc), []).extend(
            t for t in text.split() if t)
    want = {}
    for b, toks in streams.items():
        for p in range(0, (len(toks) + budget - 1) // budget):
            want[(b, p)] = toks[p * budget:(p + 1) * budget]
    assert set(got) == {k for k, v in want.items() if v}
    for key, toks in want.items():
        if not toks:
            continue
        r = got[key]
        assert r.pack_text == " ".join(toks), key
        assert r.n_tokens == len(toks)
        # only a bucket's LAST pack may be short
        if len(toks) < budget:
            assert key[1] == max(p for b, p in want if b == key[0])


def test_pii_arrow_matches_jvm(spark):
    """The r7 Arrow/RE2 PII stage (_pii_report_arrow) is byte- and
    count-identical to the java.util.regex expressions it replaced, on
    an adversarial corpus: overlapping/adjacent categories, boundary
    lookalikes, multiple matches per category, and a PII-free doc.
    (cc_luhn_ok is compared on the has-card subset only: the old JVM
    expression raises an ANSI cast error when no card matches, while
    the Arrow stage yields NULL — the driver corpus always plants a
    card, so the driver row never sees that input class.)"""
    from pyspark.sql import functions as F

    from textextract_spark.operators.textdata import (
        _CC_PATTERN, PII_PATTERNS, _luhn_sum, _pii_report_arrow, scrub_pii)

    texts = [
        "mail a.b-c_d@sub.example.co.uk or x12345@y.io thanks",
        "server 192.168.0.1 and 10.0.0.255. version v1.2.3.4x",
        "pay 4242 4242 4242 4242 then 4242-4242-4242-4242 and "
        "4242424242424242 ok",
        "iban DE89370400440532013000 ni QB123456C ssn 123-45-6789",
        "call (212) 555-0142 or 212.555.0142 or +4915123456789 now",
        "card 1111111111111111 luhn-invalid but extracted first",
        "u5@example.com10.0.5.35 card4242000000054242iban adjacency",
        "no pii in this document at all",
        "edge 4242 4242 4242 4242-4242 4242 4242 4242 overlap",
        "  leading ws and trailing 123-45-6789  ",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, __t string")
    got = {r["doc_id"]: r for r in _pii_report_arrow(docs).collect()}

    counts = [F.size(F.regexp_extract_all("__t", F.lit(pat), 0))
              .alias(f"n_{name}") for name, pat, _ in PII_PATTERNS]
    jvm_base = {r["doc_id"]: r for r in docs.select(
        "doc_id", *counts,
        scrub_pii(F.col("__t")).alias("clean_text")).collect()}
    assert set(got) == set(jvm_base)
    for i, row in jvm_base.items():
        for name, _, _ in PII_PATTERNS:
            assert got[i][f"n_{name}"] == row[f"n_{name}"], (i, name)
        assert got[i]["clean_text"] == row["clean_text"], i

    has_cc = docs.filter(
        F.regexp_extract("__t", _CC_PATTERN, 0) != "")
    cc_m = F.regexp_replace(
        F.regexp_extract("__t", _CC_PATTERN, 0), "[ -]", "")
    jvm_luhn = {r["doc_id"]: r["ok"] for r in has_cc.select(
        "doc_id", (_luhn_sum(cc_m, 16) % 10 == 0).alias("ok")).collect()}
    assert jvm_luhn  # the corpus genuinely exercises the card path
    for i in got:
        assert got[i]["cc_luhn_ok"] == jvm_luhn.get(i), i


def test_repetition_arrow_matches_jvm(spark, tmp_path):
    """The r7 single-Arrow-stage repetition_stats is value-identical to
    the r6 two-pipeline explode+agg form on an adversarial corpus:
    duplicate lines (space-padded variants), ellipsis/bullet lines
    (ASCII and unicode), single-token docs (no 2-gram row), tab-led
    lines that survive the space-only trim, packed-max ties, non-ASCII
    text, and a doc whose only content is newlines (no output row)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from textextract_spark.operators.textdata import (
        _nonempty_lines, repetition_stats)

    texts = [
        "alpha beta\nalpha beta\n  alpha beta  \ngamma...",
        "- item one\n* item two\n• item three\nplain tail…",
        "single",
        "\tindent kept\nindent kept\n\tindent kept",
        "a b a b a b a b",
        "tie aa bb\ntie aa bb",
        "données déjà vu\ndonnées déjà vu",
        "数据 分析 数据 分析",
        "\n\n",
        "x " + "y z " * 50,
    ]
    rows = [{"doc_id": i, "text": t, "lang": "en"}
            for i, t in enumerate(texts)]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r
           for r in repetition_stats(spark, str(tmp_path)).collect()}

    # the r6 JVM pipeline, inlined verbatim
    docs = (spark.read.parquet(str(tmp_path / "documents.parquet"))
            .filter(F.length(F.trim(F.col("text"))) > 0))
    base = docs.select(
        "doc_id", F.length("text").alias("n_chars"),
        F.explode(_nonempty_lines(F.col("text"))).alias("line"))
    per_line = (base.groupBy("doc_id", "n_chars", "line")
                .agg(F.count("*").alias("cnt")))
    llen = F.length("line")
    is_ellipsis = (F.col("line").endswith("...")
                   | F.col("line").endswith("…"))
    is_bullet = (F.col("line").startswith("-")
                 | F.col("line").startswith("*")
                 | F.col("line").startswith("•"))
    line_stats = per_line.groupBy("doc_id", "n_chars").agg(
        F.sum("cnt").alias("n_lines"),
        F.count("*").alias("n_distinct_lines"),
        F.sum(F.col("cnt") * llen).alias("line_chars"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * llen)
               .otherwise(F.lit(0))).alias("dup_line_chars"),
        F.sum(F.when(is_ellipsis, F.col("cnt")).otherwise(F.lit(0)))
         .alias("ellipsis_lines"),
        F.sum(F.when(is_bullet, F.col("cnt")).otherwise(F.lit(0)))
         .alias("bullet_lines"))
    nw = F.size("__ws")
    grams = (docs
             .select("doc_id",
                     F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                      .alias("__ws"))
             .filter(nw >= 2)
             .select("doc_id", F.explode(F.zip_with(
                 F.slice("__ws", 1, nw - 1), F.slice("__ws", 2, nw - 1),
                 lambda a, b: F.concat(a, F.lit(" "), b))).alias("gram")))
    per_gram = grams.groupBy("doc_id", "gram").agg(
        F.count("*").alias("cnt"))
    gram_stats = per_gram.groupBy("doc_id").agg(
        F.max(F.col("cnt") * F.lit(100000) + F.length("gram"))
         .alias("packed"))
    top_frac = F.coalesce(
        ((F.col("packed") / 100000).cast("long")
         * (F.col("packed") % 100000)) / F.col("n_chars"), F.lit(0.0))
    nl = F.col("n_lines").cast("double")
    want = {r["doc_id"]: r for r in (
        line_stats.join(gram_stats, "doc_id", "left")
        .select(
            "doc_id", F.col("n_lines"),
            F.round((F.col("n_lines") - F.col("n_distinct_lines")) / nl,
                    4).alias("dup_line_frac"),
            F.round(F.col("dup_line_chars") / F.col("line_chars"), 4)
             .alias("dup_line_char_frac"),
            F.round(F.col("ellipsis_lines") / nl, 4)
             .alias("ellipsis_line_frac"),
            F.round(F.col("bullet_lines") / nl, 4)
             .alias("bullet_line_frac"),
            F.round(top_frac, 4).alias("top2gram_char_frac"))
        ).collect()}

    assert set(got) == set(want)
    assert 8 not in got  # newline-only doc: no row, like the r6 explode
    for i in want:
        for c in ("n_lines", "dup_line_frac", "dup_line_char_frac",
                  "ellipsis_line_frac", "bullet_line_frac",
                  "top2gram_char_frac"):
            assert got[i][c] == want[i][c], (i, c)


def test_char_lm_score_non_ascii(spark, tmp_path):
    """The r7 zero-copy UTF-8 scoring kernel takes a per-doc UTF-16
    decode fallback for non-ASCII text. Under a bijective character
    substitution (ascii lowercase -> fullwidth lowercase, one BMP code
    unit each) the bigram COUNT structure of a corpus is unchanged, so
    the trained model probabilities, per-doc n_bigrams, cross-entropy,
    perplexity and bucket must all be EQUAL to the ascii original —
    which exercises the fallback path end-to-end against the fast
    path's values."""
    from pyspark.sql import functions as F

    from textextract_spark.operators.textdata import char_lm_perplexity

    texts = ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs",
             "the the the the repeated words here",
             "zz unseen bigrams qq xx vv",
             "mixed case Words Are Lowered First"]
    wide = str.maketrans({c: chr(0xFF41 + ord(c) - ord("a"))
                          for c in "abcdefghijklmnopqrstuvwxyz"})

    def run(mapped: bool):
        rows = [(i, t.lower().translate(wide) if mapped else t)
                for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        ref = docs.filter(F.col("doc_id") < 3)
        return {r["doc_id"]: r
                for r in char_lm_perplexity(docs, ref).collect()}

    got_ascii = run(False)
    got_wide = run(True)
    assert set(got_ascii) == set(got_wide) == set(range(len(texts)))
    for i in got_ascii:
        for c in ("n_bigrams", "cross_entropy", "perplexity",
                  "ppl_bucket"):
            assert got_ascii[i][c] == got_wide[i][c], (i, c)


def test_char_lm_score_string_ids(spark):
    """The scoring kernel must preserve the id column's input type: the
    curation journey (curation_decisions_full) keys it by url STRINGS.
    Caught live in r7 when the Arrow kernel briefly hard-coded long
    ids and the curate CLI failed on cast."""
    from pyspark.sql import functions as F

    from textextract_spark.operators.textdata import char_lm_perplexity

    docs = spark.createDataFrame(
        [("u://a", "the cat sat"), ("u://b", "on the mat")],
        "doc_id string, text string")
    rows = {r["doc_id"]: r for r in char_lm_perplexity(
        docs, docs.select("text")).collect()}
    assert set(rows) == {"u://a", "u://b"}
    assert all(r["n_bigrams"] > 0 for r in rows.values())


def test_media_memo_dedups_decode_work(monkeypatch):
    """The r7 dedup-before-decode memos must call the codec once per
    DISTINCT source per task and still emit one correct row per input
    row (pure-function outputs; memoized and unmemoized values equal)."""
    import pandas as pd

    from textextract_spark.operators import multimodal as mm

    calls = {"n": 0}
    real = mm.decode_media

    def counting(payload, media_type):
        calls["n"] += 1
        return real(payload, media_type)

    monkeypatch.setattr(mm, "decode_media", counting)
    # 60 rows over 3 distinct payloads (media_id repeats mod 3 synth
    # params when ids repeat): feed duplicated payloads directly
    payloads = [mm.build_png(4, 3), mm.build_bmp(5, 2),
                mm.build_wav(1, 8000, 16, 20)]
    pdf = pd.DataFrame({
        "media_id": pd.Series(range(60), dtype="int64"),
        "media": [payloads[i % 3] for i in range(60)],
    })
    out = pd.concat(list(mm._decode_batches(iter([pdf]))))
    assert len(out) == 60
    assert calls["n"] == 3  # one decode per distinct payload
    # values equal the unmemoized decode
    f = real(payloads[0], "image")
    assert out.iloc[0]["width"] == f["width"]
    assert out.iloc[0]["height"] == f["height"]
