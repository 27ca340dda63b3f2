"""Unit tests for text/texttype.py — the Title/Narrative heuristics the
by-title chunker keys on. The calibration cases come straight from the
reference's recorded chunk boundaries on alps_wiki.pdf (see
docs/chunking_parity.md): each one pins a decision that moves a chunk
boundary."""

from dial_rag_tpu.text.texttype import (
    classify_text,
    contains_verb,
    exceeds_cap_ratio,
    is_possible_narrative_text,
    is_possible_title,
    sentence_count,
    split_sentences,
    under_non_alpha_ratio,
    word_tokenize,
)


class TestTokenizers:
    def test_word_tokenize_splits_punct_keeps_urls(self):
        toks = word_tokenize('Retrieved from "https://en.wikipedia.org/x"')
        assert "Retrieved" in toks and '"' in toks
        assert any(t.startswith("https://") for t in toks)

    def test_sentence_split_on_terminal_punct(self):
        sents = split_sentences(
            "The Alps are high. They stretch far. Really!"
        )
        assert len(sents) == 3

    def test_sentence_count_min_length(self):
        text = "Short. This sentence has five words here."
        assert sentence_count(text) == 2
        assert sentence_count(text, 3) == 1


class TestChecks:
    def test_under_non_alpha(self):
        assert under_non_alpha_ratio("101. (2000), 27 12–13")
        assert not under_non_alpha_ratio("Etymology and toponymy")

    def test_cap_ratio_counts_punct_in_denominator(self):
        # punctuation-heavy reference-list lines must NOT read as
        # headings: '128. "Rail". (http://...) ... 2012' has only 3
        # capitalized words among ~16 tokens
        line = (
            '128. "Rail". (http://www.swissworld.org/en/rail/) '
            "Swissworld.org. Retrieved August 20, 2012"
        )
        assert not exceeds_cap_ratio(line)
        assert exceeds_cap_ratio("Caspar David Friedrich")

    def test_contains_verb_common_participles_but_not_rare(self):
        # 'Retrieved'/'According' are tagger-known participles; rare
        # capitalized -ed words read as proper nouns (the reference's
        # boundary behavior distinguishes exactly these)
        assert contains_verb("Retrieved August 20, 2012")
        assert contains_verb("According to the survey")
        assert not contains_verb("(Reverted edits by Urmomy (talk))")
        assert contains_verb("the mountains were formed")
        assert not contains_verb("Etymology and toponymy")


class TestClassification:
    def test_headings_are_titles(self):
        for t in (
            "External links",
            "References",
            "Geography",
            "Etymology and toponymy",
            "Edelweiss (Leontopodium alpinum)",
            "Caspar David Friedrich",
            "Prehistory to Christianity",
        ):
            assert classify_text(t) == "title", t

    def test_narrative_is_not_title(self):
        for t in (
            "The Alps are a classic example of what happens when a "
            "temperate area at lower altitude gives way to "
            "higher-elevation terrain.",
            'Retrieved from "https://en.wikipedia.org/w/index.php?x=1"',
            '128. "Rail". (http://www.swissworld.org/en/rail/) '
            "Swissworld.org. Retrieved August 20, 2012",
        ):
            assert classify_text(t) != "title", t

    def test_fragments(self):
        assert classify_text("Monaco,") == "text"  # trailing comma
        assert classify_text("130. Hudson (2000), 107") == "text"
        assert is_possible_title("Template:Lang-de")
        assert not is_possible_narrative_text("Template:Lang-de")

    def test_bulleted(self):
        assert classify_text("• first item") == "list_item"
        assert classify_text("•") == "text"
