"""First-party PDF parser: structure, filters, text extraction, layout."""

import os
import zlib

import pytest

from dial_rag_tpu.documents.pdf import (
    PdfDocument,
    PdfError,
    extract_pages_text,
)
from dial_rag_tpu.documents.pdf.filters import (
    apply_predictor,
    ascii85_decode,
    asciihex_decode,
    lzw_decode,
    runlength_decode,
)
from dial_rag_tpu.documents.pdf.objects import Lexer, Name, Ref
from tests.utils.pdf_builder import build_pdf

ALPS_PDF = "/root/reference/tests/data/alps_wiki.pdf"


class TestLexer:
    def parse(self, data):
        return Lexer(data).parse_object()

    def test_numbers(self):
        assert self.parse(b"42") == 42
        assert self.parse(b"-3") == -3
        assert self.parse(b"3.14") == 3.14
        assert self.parse(b"+.5") == 0.5
        assert self.parse(b"4.") == 4.0

    def test_refs(self):
        assert self.parse(b"12 0 R") == Ref(12, 0)
        assert self.parse(b"12 0") == 12  # not a ref without R

    def test_strings(self):
        assert self.parse(rb"(hello)") == b"hello"
        assert self.parse(rb"(a\(b\)c)") == b"a(b)c"
        assert self.parse(rb"(nest(ed))") == b"nest(ed)"
        assert self.parse(rb"(oct\101al)") == b"octAal"
        assert self.parse(rb"(nl\n)") == b"nl\n"
        assert self.parse(b"<48656C6C6F>") == b"Hello"
        assert self.parse(b"<48656C6C6F2>") == b"Hello "  # odd digit pads 0

    def test_names(self):
        assert self.parse(b"/Type") == Name("Type")
        assert self.parse(b"/A#20B") == Name("A B")

    def test_collections(self):
        assert self.parse(b"[1 2 /X (s)]") == [1, 2, Name("X"), b"s"]
        d = self.parse(b"<< /A 1 /B [2 3] /C << /D true >> >>")
        assert d == {"A": 1, "B": [2, 3], "C": {"D": True}}

    def test_comment_and_null(self):
        assert self.parse(b"% comment\n null") is None


class TestFilters:
    def test_asciihex(self):
        assert asciihex_decode(b"48 65 6C 6C 6F>") == b"Hello"

    def test_ascii85(self):
        assert ascii85_decode(b"87cUR~>") == b"Hell"
        assert ascii85_decode(b"z~>") == b"\0\0\0\0"

    def test_runlength(self):
        # 2 literal bytes "ab", then "c" x3, then EOD
        assert runlength_decode(bytes([1]) + b"ab" + bytes([254]) + b"c" + bytes([128])) == b"abccc"

    def test_lzw(self):
        # canonical LZW round-trip via a tiny encoder
        def lzw_encode(data):
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            code_len = 9
            out, buf, bits = bytearray(), 0, 0

            def emit(code):
                nonlocal buf, bits
                buf = (buf << code_len) | code
                bits += code_len
                while bits >= 8:
                    bits -= 8
                    out.append((buf >> bits) & 0xFF)

            emit(256)
            w = b""
            for b in data:
                wc = w + bytes([b])
                if wc in table:
                    w = wc
                else:
                    emit(table[w])
                    table[wc] = next_code
                    next_code += 1
                    if next_code + 1 - 1 >= (1 << code_len) and code_len < 12:
                        code_len += 1
                    w = bytes([b])
            if w:
                emit(table[w])
            emit(257)
            if bits:
                out.append((buf << (8 - bits)) & 0xFF)
            return bytes(out)

        payload = b"TOBEORNOTTOBEORTOBEORNOT" * 3
        assert lzw_decode(lzw_encode(payload)) == payload

    def test_png_predictor_up(self):
        # 2 rows of 3 bytes, filter type 2 (Up)
        raw = bytes([0, 1, 2, 3]) + bytes([2, 1, 1, 1])
        out = apply_predictor(raw, {"Predictor": 12, "Columns": 3})
        assert out == bytes([1, 2, 3, 2, 3, 4])


class TestDocument:
    def test_single_page(self):
        pdf = build_pdf([[(72, 720, 12, "Hello World")]])
        doc = PdfDocument(pdf)
        assert doc.num_pages == 1
        pages = extract_pages_text(pdf)
        assert pages[0].page_number == 1
        assert pages[0].text == "Hello World"

    def test_multi_page_compressed(self):
        pdf = build_pdf(
            [
                [(72, 720, 18, "Title Page"), (72, 700, 11, "Some body text.")],
                [(72, 720, 11, "Second page content here")],
            ],
            compress=True,
        )
        pages = extract_pages_text(pdf)
        assert len(pages) == 2
        assert "Title Page" in pages[0].text
        assert "Some body text." in pages[0].text
        assert pages[1].text == "Second page content here"

    def test_xref_stream_and_object_streams(self):
        pdf = build_pdf(
            [[(72, 720, 12, "Stream xref works")]],
            compress=True,
            use_xref_stream=True,
        )
        assert b"/ObjStm" in pdf
        pages = extract_pages_text(pdf)
        assert pages[0].text == "Stream xref works"

    def test_damaged_xref_fallback(self):
        pdf = build_pdf([[(72, 720, 12, "Recovered")]])
        # corrupt the startxref offset
        broken = pdf.replace(b"startxref", b"startxref\n999999\n%%garbled", 1)
        pages = extract_pages_text(broken)
        assert pages[0].text == "Recovered"

    def test_blocks_split_on_font_size(self):
        pdf = build_pdf(
            [
                [
                    (72, 720, 18, "Heading"),
                    (72, 695, 11, "First paragraph line one."),
                    (72, 681, 11, "First paragraph line two."),
                ]
            ]
        )
        pages = extract_pages_text(pdf)
        blocks = pages[0].blocks
        assert [b.text for b in blocks] == [
            "Heading",
            "First paragraph line one. First paragraph line two.",
        ]
        assert blocks[0].font_size > blocks[1].font_size

    def test_not_a_pdf(self):
        with pytest.raises(PdfError):
            PdfDocument(b"plain text")


@pytest.mark.skipif(not os.path.exists(ALPS_PDF), reason="reference data absent")
class TestRealWorldPdf:
    """Integration against the reference repo's real 23-page wiki PDF
    (read-only use of mounted data; not copied into this repo)."""

    @pytest.fixture(scope="class")
    def pages(self):
        with open(ALPS_PDF, "rb") as f:
            return extract_pages_text(f.read())

    def test_page_count(self, pages):
        assert len(pages) >= 10

    def test_known_content_present(self, pages):
        full = "\n".join(p.text for p in pages).lower()
        assert "alps" in full
        assert "cadibona" in full
        assert "climate" in full

    def test_total_text_volume(self, pages):
        total = sum(len(p.text) for p in pages)
        assert total > 20000  # a real extraction, not fragments


def test_lzw_long_stream_roundtrip():
    """LZW code width must grow at dict_size + EarlyChange; regression
    for the off-by-one that corrupted streams past the 511-entry table."""
    from dial_rag_tpu.documents.pdf.filters import lzw_decode

    # encode with a minimal reference LZW encoder (early-change variant)
    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        code_len = 9
        out = bytearray()
        buf = 0
        bits = 0

        def emit(code):
            nonlocal buf, bits
            buf = (buf << code_len) | code
            bits += code_len
            while bits >= 8:
                bits -= 8
                out.append((buf >> bits) & 0xFF)

        emit(256)  # clear table
        w = b""
        for b in data:
            c = bytes([b])
            if w + c in table:
                w = w + c
                continue
            emit(table[w])
            table[w + c] = next_code
            next_code += 1
            # early change: width grows one code earlier
            if next_code + 1 - 1 >= (1 << code_len) and code_len < 12:
                code_len += 1
            w = c
        if w:
            emit(table[w])
        emit(257)  # EOD
        if bits:
            out.append((buf << (8 - bits)) & 0xFF)
        return bytes(out)

    import numpy as np

    rng = np.random.default_rng(0)
    # long enough to cross the 511- and 1023-entry boundaries
    payload = bytes(rng.integers(0, 16, size=5000, dtype=np.uint8))
    assert lzw_decode(lzw_encode(payload), early_change=1) == payload


def test_corrupt_flate_stream_is_pdf_error():
    from dial_rag_tpu.documents.pdf.filters import decode_stream
    from dial_rag_tpu.documents.pdf.objects import Name, PdfError, Stream

    stream = Stream(
        dict={"Filter": Name("FlateDecode"), "Length": 4},
        raw=b"\xff\xfe\xfd\xfc",
    )
    with pytest.raises(PdfError):
        decode_stream(stream, resolve=lambda x: x)


def test_malformed_number_is_pdf_error():
    from dial_rag_tpu.documents.pdf.objects import Lexer, PdfError

    with pytest.raises(PdfError):
        Lexer(b"1.2.3 ").parse_object()


def test_malformed_operand_does_not_abort_page():
    """A Name where a number is expected must skip the operator, not the
    whole document."""
    from tests.utils.pdf_builder import build_pdf
    from dial_rag_tpu.documents.pdf import extract_pages_text

    pdf = build_pdf([[(72, 720, 12, "real text")]])
    # splice a malformed cm operator before the text
    bad = pdf.replace(b"BT /F1", b"/F1 1 0 0 1 0 cm BT /F1", 1)
    pages = extract_pages_text(bad)
    assert any("real text" in b.text for p in pages for b in p.blocks)


def test_fuzzed_garbage_never_escapes_pdf_error():
    """Random mutations of a valid PDF must either parse or raise
    InvalidDocumentError/PdfError — never TypeError/ValueError/zlib.error."""
    import numpy as np

    from dial_rag_tpu.documents.parser import parse_document
    from dial_rag_tpu.errors import InvalidDocumentError
    from tests.utils.pdf_builder import build_pdf

    rng = np.random.default_rng(0)
    for use_xref_stream in (False, True):
        base = bytearray(
            build_pdf(
                [[(72, 720, 12, "some text to mutate around")]],
                compress=True,
                use_xref_stream=use_xref_stream,
            )
        )
        for trial in range(80):
            data = bytearray(base)
            for _ in range(int(rng.integers(1, 10))):
                pos = int(rng.integers(0, len(data)))
                data[pos] = int(rng.integers(0, 256))
            try:
                parse_document(
                    bytes(data), "application/pdf", source_link="f.pdf"
                )
            except InvalidDocumentError:
                pass  # the acceptable failure mode
