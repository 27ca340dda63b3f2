"""Unit tests for documents/pdf/layout.py grouping rules.

Each rule was fitted against the reference's recorded elements
(docs/chunking_parity.md); these tests pin the rules on synthetic
geometry so regressions surface without parsing the real corpus."""

from dial_rag_tpu.documents.pdf.layout import (
    LayoutParams,
    TextLineH,
    group_chars_to_lines,
    group_lines_to_elements,
)
from dial_rag_tpu.documents.pdf.text import Glyph

P = LayoutParams()


def line(text, x0, y0, x1, y1):
    ln = TextLineH()
    w = (x1 - x0) / max(len(text), 1)
    for i, ch in enumerate(text):
        ln.add(
            Glyph(
                text=ch,
                x0=x0 + i * w,
                y0=y0,
                x1=x0 + (i + 1) * w,
                y1=y1,
            ),
            word_margin=0.0,
        )
    return ln


def texts(elements):
    return [e.text.replace("\n", " ").strip() for e in elements]


class TestElementGrouping:
    def test_left_aligned_paragraph_merges(self):
        lines = [
            line("first line of text", 36, 688, 300, 700),
            line("second line of text", 36, 672, 300, 684),
        ]
        els = group_lines_to_elements(lines, P)
        assert texts(els) == ["first line of text second line of text"]

    def test_paragraph_gap_splits(self):
        lines = [
            line("paragraph one", 36, 688, 300, 700),
            line("paragraph two", 36, 660, 300, 672),  # gap 16 > 6
        ]
        els = group_lines_to_elements(lines, P)
        assert len(els) == 2

    def test_hanging_indent_continuation_merges(self):
        lines = [
            line("101. An item that wraps to the margin", 28, 688, 570, 700),
            line("continuation line", 55, 672, 200, 684),
        ]
        els = group_lines_to_elements(lines, P)
        assert len(els) == 1

    def test_outdent_after_continuation_splits(self):
        lines = [
            line("101. An item that wraps to the margin", 28, 688, 570, 700),
            line("continuation line", 55, 672, 200, 684),
            line("102. Next item", 28, 656, 150, 668),
        ]
        els = group_lines_to_elements(lines, P)
        assert texts(els)[-1] == "102. Next item"
        assert len(els) == 2

    def test_over_wide_indented_line_is_new_element(self):
        # a continuation may overshoot the element's right edge only by
        # cont_ext_ratio x its own width
        lines = [
            line("61. Short item text", 35, 688, 518, 700),
            line("x" * 50, 55, 672, 570, 684),  # extends 52 beyond
        ]
        els = group_lines_to_elements(lines, P)
        assert len(els) == 2

    def test_right_aligned_wrap_merges(self):
        # column return below an image: x0 jumps left but x1 aligns
        lines = [
            line("text beside an image", 246, 688, 576, 700),
            line("full width continuation line goes here", 36, 672, 576, 684),
        ]
        els = group_lines_to_elements(lines, P)
        assert len(els) == 1

    def test_same_line_pieces_merge_when_near(self):
        a = line("Austrian-born Adolf", 261, 688, 469, 700)
        b = line("lifelong", 478, 688, 576, 700)  # gap 9 <= 12
        els = group_lines_to_elements([a, b], P)
        assert len(els) == 1

    def test_same_line_distant_caption_stays_separate(self):
        a = line("body column text here", 246, 688, 576, 700)
        b = line("margin caption", 40, 687, 215, 699)  # hdist 31 > 12
        els = group_lines_to_elements([a, b], P)
        assert len(els) == 2

    def test_interleaved_caption_continues_its_own_element(self):
        # caption lines interleave with body lines in y-order but each
        # continues its own element (multi-open-element matching)
        body1 = line("body text line one x", 201, 688, 576, 700)
        cap1 = line("Edelweiss caption", 40, 682, 155, 692)
        body2 = line("body text line two x", 201, 672, 576, 684)
        cap2 = line("second caption line", 40, 668, 120, 678)
        els = group_lines_to_elements([body1, cap1, body2, cap2], P)
        assert sorted(texts(els)) == sorted(
            [
                "body text line one x body text line two x",
                "Edelweiss caption second caption line",
            ]
        )


class TestCharChaining:
    def test_wide_gap_splits_line(self):
        chars = [
            Glyph(text="a", x0=10, y0=0, x1=16, y1=12),
            Glyph(text="b", x0=40, y0=0, x1=46, y1=12),  # gap 24 > 12
        ]
        lines = group_chars_to_lines(chars, P)
        assert len(lines) == 2

    def test_small_gap_chains(self):
        chars = [
            Glyph(text="a", x0=10, y0=0, x1=16, y1=12),
            Glyph(text="b", x0=20, y0=0, x1=26, y1=12),  # gap 4 < 12
        ]
        lines = group_chars_to_lines(chars, P)
        # the 4-unit gap chains into one line, with a virtual
        # word space inserted (word_margin semantics)
        assert len(lines) == 1 and lines[0].text == "a b"

    def test_different_baselines_split(self):
        chars = [
            Glyph(text="a", x0=10, y0=0, x1=16, y1=12),
            Glyph(text="b", x0=17, y0=-20, x1=23, y1=-8),
        ]
        lines = group_chars_to_lines(chars, P)
        assert len(lines) == 2
