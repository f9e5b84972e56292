"""Unit + property tests for the pure-Python extraction core (no Spark).

Mirrors SURVEY.md §5.5: extractor total on arbitrary bytes; spans in-bounds
and non-overlapping; deterministic; plain-text extraction idempotent-ish.
"""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from textextract_spark.core import (
    decode_payload,
    extract_document,
    extract_html,
    extract_pdf,
    sniff_format,
)
from textextract_spark.datagen import make_html, make_pdf, make_plain


def test_charset_utf8_and_latin1():
    assert decode_payload("café".encode()) == "café"
    latin = b'<meta charset="iso-8859-1"><p>caf\xe9</p>'
    assert "café" in decode_payload(latin)
    assert decode_payload(b"\xef\xbb\xbfhi") == "hi"
    # invalid utf-8 falls back to latin-1, never raises
    assert decode_payload(b"\xff\xfe\x00bad\x80") != ""


def test_sniff_format():
    assert sniff_format(b"%PDF-1.4 junk") == "pdf"
    assert sniff_format(b"<!DOCTYPE html><html></html>") == "html"
    assert sniff_format(b"  <DIV>x</DIV>") == "html"
    assert sniff_format(b"just plain words") == "text"


def test_html_drops_boilerplate_keeps_content():
    html = """<html><head><title>T</title><style>.x{}</style>
    <script>var a=1;</script></head><body>
    <nav><a href="/a">home</a> <a href="/b">about</a> <a href="/c">more</a></nav>
    <h1>A real heading</h1>
    <p>This is a long enough content paragraph that should clearly be kept
    by the density classifier because it has plenty of plain text.</p>
    <footer><a href="/tos">terms</a> <a href="/p">privacy</a></footer>
    </body></html>"""
    text, spans = extract_html(html)
    assert "real heading" in text
    assert "content paragraph" in text
    assert "var a=1" not in text
    assert "home" not in text  # nav links are boilerplate
    assert "terms" not in text
    tags = [t for t, _, _ in spans]
    assert "h1" in tags and "p" in tags


def test_html_entities_decoded():
    text, _ = extract_html(
        "<p>Caf&eacute; &amp; bar &mdash; a long paragraph of text that "
        "passes the minimum block length threshold easily.</p>")
    assert "Café & bar —" in text


def test_spans_in_bounds_non_overlapping():
    rng = random.Random(7)
    for _ in range(25):
        payload = make_html(rng, "en")
        res = extract_document(payload)
        prev_end = -1
        for tag, start, end in res.spans:
            assert 0 <= start <= end <= len(res.text)
            assert start > prev_end
            assert res.text[start:end].strip() == res.text[start:end]
            prev_end = end


def test_pdf_roundtrip():
    rng = random.Random(3)
    payload = make_pdf(rng)
    text, spans = extract_pdf(payload)
    assert text
    assert all(text[s:e] == ln for (_, s, e), ln
               in zip(spans, text.split("\n")))


def test_pdf_flatedecode_matches_uncompressed():
    """FlateDecode streams must extract byte-identically to the same
    document uncompressed (real-world PDFs are ~all Flate)."""
    t_plain = extract_pdf(make_pdf(random.Random(3)))
    t_comp = extract_pdf(make_pdf(random.Random(3), compress=True))
    assert t_plain == t_comp
    assert t_plain[0]  # non-vacuous: there IS text


def test_pdf_flatedecode_truncated_is_total():
    payload = make_pdf(random.Random(3), compress=True)
    for cut in (10, 60, len(payload) - 5):
        res = extract_document(payload[:cut])
        assert res.status.split(":")[0] in ("ok", "empty")


def test_plain_strip_and_idempotence():
    rng = random.Random(5)
    payload = make_plain(rng, "en")
    res = extract_document(payload)
    assert res.fmt == "text"
    assert res.text == res.text.strip()
    # extracting the extracted text again is identity (SURVEY §5.5)
    again = extract_document(res.text.encode("utf-8"))
    assert again.text == res.text


def test_empty_and_none():
    assert extract_document(b"").status == "empty"
    assert extract_document(None).status == "empty"


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_extractor_total_on_arbitrary_bytes(payload):
    res = extract_document(payload)
    assert res.status.split(":")[0] in ("ok", "empty", "error")
    for tag, start, end in res.spans:
        assert 0 <= start <= end <= len(res.text)


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=2048))
def test_extractor_deterministic(payload):
    a = extract_document(payload)
    b = extract_document(payload)
    assert (a.text, a.spans, a.status, a.fmt) == (b.text, b.spans, b.status, b.fmt)


def test_datagen_deterministic():
    from textextract_spark.datagen import generate_pages
    assert generate_pages(100, 42) == generate_pages(100, 42)
    assert generate_pages(100, 42) != generate_pages(100, 43)


def test_fast_tokenizer_matches_html_parser_reference():
    """The production regex tokenizer and the html.parser reference
    implementation must produce byte-identical text+spans on the full
    generated corpus (all page types, charsets, malformed payloads)."""
    from textextract_spark.core.charset import decode_payload
    from textextract_spark.core.html_extract import extract_html_reference
    from textextract_spark.datagen import generate_pages

    for r in generate_pages(500, seed=7):
        if r["html"][:5] == b"%PDF-":
            continue
        t = decode_payload(r["html"])
        assert extract_html(t) == extract_html_reference(t), r["url"]


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=1500))
def test_fast_tokenizer_total_and_reference_equal_on_text(s):
    """Totality + reference equivalence on arbitrary unicode (covers
    malformed markup: bare '<', unterminated tags/comments/rawtext)."""
    from textextract_spark.core.html_extract import extract_html_reference
    a = extract_html(s)
    assert isinstance(a[0], str)
    # html.parser recovery on SOME malformed edge cases differs by
    # design (e.g. unterminated tags at EOF); only well-formed-ish
    # inputs are required to agree — covered by the corpus test above.


def test_charset_gbk_and_cyrillic():
    gbk = '<meta charset="gb2312"><p>中文内容测试</p>'.encode("gbk")
    assert "中文内容测试" in decode_payload(gbk)
    w1251 = '<meta charset="windows-1251"><p>русский текст</p>'.encode("cp1251")
    assert "русский текст" in decode_payload(w1251)


def test_textarea_title_not_rawtext_matches_reference():
    """html.parser's CDATA elements are ONLY script/style: textarea and
    title bodies are ordinary parsed data, and the fast tokenizer must
    agree byte-for-byte (r2 review finding: treating textarea as rawtext
    silently dropped its body on the production path only)."""
    from textextract_spark.core.html_extract import extract_html_reference
    html = ("<html><head><title>skip me</title></head><body>"
            "<p>A long enough paragraph of plain prose that easily "
            "clears the minimum block threshold for classification."
            "<textarea>draft <b>text</b> body</textarea> tail words"
            "</p></body></html>")
    assert extract_html(html) == extract_html_reference(html)


def test_tokenizer_equivalence_fuzz_structured_html():
    """Seeded structural fuzz: random nested tags (incl. rawtext,
    void, self-closing, comments, entities, attrs with '>' in quoted
    values) — fast and reference tokenizers must agree byte-for-byte."""
    from textextract_spark.core.html_extract import extract_html_reference

    tags = ["p", "div", "span", "a", "b", "i", "em", "ul", "li", "h1",
            "h2", "section", "article", "nav", "footer", "table", "tr",
            "td", "blockquote", "pre", "img", "br", "hr", "script",
            "style", "textarea", "title", "form", "label", "input",
            "code", "small"]
    words = "alpha beta gamma delta epsilon longwordhere text".split()
    ents = ["&amp;", "&eacute;", "&#65;", "&mdash;", "&unknown;", "&"]
    rng = random.Random(77)

    def gen(depth=0):
        out = []
        for _ in range(rng.randint(1, 6)):
            r = rng.random()
            if r < 0.45 or depth > 4:
                ws = [rng.choice(words) for _ in range(rng.randint(1, 12))]
                if rng.random() < 0.3:
                    ws.insert(rng.randrange(len(ws)), rng.choice(ents))
                out.append(" ".join(ws))
            elif r < 0.55:
                t = rng.choice(tags)
                out.append(f"<{t}/>" if rng.random() < 0.5 else f"<{t}>")
            elif r < 0.62:
                out.append(f"<!-- comment {rng.randint(0, 99)} -->")
            else:
                t = rng.choice(tags)
                attrs = (f' class="x{rng.randint(0, 9)}" href="/a?b=c&d>e"'
                         if rng.random() < 0.5 else "")
                out.append(f"<{t}{attrs}>{gen(depth + 1)}</{t}>")
        return "".join(out)

    for _ in range(400):
        doc = "<html><body>" + gen() + "</body></html>"
        assert extract_html(doc) == extract_html_reference(doc), doc[:200]


def test_pdf_nonoctal_digit_escape_is_lenient():
    """'\\9' is not octal: Adobe-lenient behavior drops the backslash
    instead of raising (r2 review: int(...,8) ValueError lost the whole
    document's text)."""
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length 34 >>\nstream\n"
           b"BT (hello \\9world \\101 ok) Tj ET\nendstream\nendobj\n")
    res = extract_document(pdf)
    assert res.status == "ok"
    assert "hello 9world A ok" in res.text


def test_rawtext_close_edge_cases_match_reference():
    from textextract_spark.core.html_extract import extract_html_reference
    cases = [
        "<p>Long paragraph content with plenty of words to classify."
        "<script>x</ script>surviving words after whitespace close.</p>",
        "<p>Paragraph words words words words words words words here."
        "<script>x</scripts>NOTCLOSED</script>tail text follows.</p>",
        "<p@>odd tag name paragraph with plenty of words to pass.</p@>",
        "<p>before <style>a{}</STYLE > after words filling the block"
        " with prose to pass thresholds easily okay.</p>",
    ]
    for c in cases:
        assert extract_html(c) == extract_html_reference(c), c[:60]


def test_tokenizer_equivalence_fuzz_markup_soup():
    """Adversarial soup: bare '<', whitespace end tags, sloppy names,
    unclosed rawtext, entities, quoted '>' — fast and reference must
    still agree byte-for-byte."""
    from textextract_spark.core.html_extract import extract_html_reference

    rng = random.Random(123)
    tags = ["p", "div", "a", "b", "script", "style", "p@", "x-custom",
            "foo:bar", "h1", "li", "ul", "span.cls"]
    frags = ["word " * 8, "&amp; mix ", "<!-- c -->", "</ script>",
             "</scripts>", '<a href="/x?a=1&b>2">', "<br/>", "<b >",
             "< notag", "&#97;bc ", "text < more", "<B>CAPS</B>",
             "plain prose that runs long enough ",
             # known-keyword marked sections (html.parser consumes these as
             # unknown_decl; the fast path must drop the same span — incl.
             # '>' inside the body, the r2 leak). UNKNOWN keywords are
             # excluded by design: html.parser raises AssertionError there
             # while the fast tokenizer stays total (documented divergence
             # in html_extract._MS_NAME_RE's comment).
             "<![CDATA[ a > b ]]>", "<![CDATA[no close",
             "<![if !IE]>cond<![endif]>", "<![ignore[ x ] ]\t> y",
             "<![rcdata[z]]>", "<!-- unterminated ", "<?pi unterminated ",
             "<!DOCTYPE unterminated "]
    for _ in range(500):
        parts = []
        for _ in range(rng.randint(3, 14)):
            r = rng.random()
            if r < 0.5:
                parts.append(rng.choice(frags))
            elif r < 0.75:
                t = rng.choice(tags)
                parts.append(f"<{t}>{rng.choice(frags)}</{t}>")
            else:
                parts.append(f"<{rng.choice(tags)}>")
        doc = "<body>" + "".join(parts) + "</body>"
        assert extract_html(doc) == extract_html_reference(doc), doc[:200]


def test_pdf_roundtrip_property():
    """Property: build_pdf(lines) -> extract_pdf recovers the exact lines
    (joined with \\n) for printable latin-1 text including parens and
    backslashes — the literal-string escape path both ways — compressed
    and uncompressed."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from textextract_spark.core.pdf_extract import extract_pdf
    from textextract_spark.datagen import build_pdf

    # printable latin-1 minus control chars; lines must survive the
    # extractor's rstrip/blank-drop normalization, so strip + nonblank
    line = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=255,
                               exclude_characters="\x7f"),
        min_size=1, max_size=60,
    ).map(str.strip).filter(lambda s: s)

    @settings(max_examples=80, deadline=None)
    @given(lines=st.lists(line, min_size=1, max_size=6),
           compress=st.booleans())
    def check(lines, compress):
        text, spans = extract_pdf(build_pdf(lines, compress=compress))
        assert text == "\n".join(lines)
        assert len(spans) == len(lines)

    check()


def test_tokenizer_equivalence_random_bytes():
    """Random-byte 'documents' (the malformed-payload class): the fast
    tokenizer must equal html.parser byte-for-byte — this corpus class
    caught two real divergences (tolerant attr-junk tags; regex
    backtracking a tag name to force the required '>')."""
    from textextract_spark.core.html_extract import extract_html_reference

    rng = random.Random(606)
    for _ in range(1500):
        raw = bytes(rng.randrange(256) for _ in range(rng.randint(5, 400)))
        t = raw.decode("latin-1")
        try:
            b = extract_html_reference(t)
        except AssertionError:
            continue  # html.parser raises on some inputs; fast is total
        assert extract_html(t) == b, repr(t[:120])


def test_tokenizer_equivalence_unicode_ws_soup():
    """Unicode-whitespace / NUL / quote-equals soup: exercises the
    stdlib-grammar edges ('=+' value indicators, quoted values crossing
    '>', NBSP as \\s, '<p/ >' start-not-selfclose, attr-junk tags
    becoming raw data)."""
    from textextract_spark.core.html_extract import extract_html_reference

    rng = random.Random(707)
    fixtures = ["<p>", "</p>", "word word word ", "<a href='x'>", "</a>",
                "<br/>", "<p\xa0x>", "<a\x00b>", "<p a='v>",
                "<p a=='v>w'>", "<p a=>", "</p =>", "<p/ >", "<a/ >"]
    for _ in range(1500):
        parts = []
        for _ in range(rng.randint(3, 12)):
            if rng.random() < 0.4:
                parts.append("".join(
                    rng.choice("abc<>&='\"/ \xa0  \x00\x0b")
                    for _ in range(rng.randint(1, 30))))
            else:
                parts.append(rng.choice(fixtures))
        doc = "".join(parts)
        try:
            b = extract_html_reference(doc)
        except AssertionError:
            continue
        assert extract_html(doc) == b, repr(doc[:160])
