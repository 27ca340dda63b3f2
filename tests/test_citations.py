"""Citation rewriting parity (cases mirror reference
tests/test_reference_documents.py behaviors)."""

from dial_rag_tpu.service.citations import rewrite_citations


async def run(pieces, n):
    text = []
    used = None
    async def gen():
        for p in pieces:
            yield p

    async for piece, final in rewrite_citations(gen(), n):
        if final is not None:
            used = final
        else:
            text.append(piece)
    return "".join(text), used


async def test_simple_rewrite():
    text, used = await run(["Answer <[2]> and more <[5]>."], 5)
    assert text == "Answer [1] and more [2]."
    assert used == [1, 4]


async def test_repeat_reuses_number():
    text, used = await run(["a <[3]> b <[1]> c <[3]> d"], 5)
    assert text == "a [1] b [2] c [1] d"
    assert used == [2, 0]


async def test_tag_split_across_chunks():
    text, used = await run(["first chunk <[", "1]> second chunk"], 3)
    assert text == "first chunk [1] second chunk"
    assert used == [0]


async def test_tag_split_at_angle_bracket():
    text, used = await run(["piece <", "[2]> end"], 3)
    assert text == "piece [1] end"
    assert used == [1]


async def test_out_of_bounds_passthrough():
    text, used = await run(["see <[23]> here"], 3)
    assert text == "see <[23]> here"
    assert used == []


async def test_literal_brackets_untouched():
    text, used = await run(["array[0] and [5] stay"], 3)
    assert text == "array[0] and [5] stay"
    assert used == []


async def test_unterminated_tag_flushed_at_end():
    text, used = await run(["ends with <["], 3)
    assert text == "ends with <["
    assert used == []


async def test_no_citations():
    text, used = await run(["hello ", "world"], 0)
    assert text == "hello world"
    assert used == []


async def test_multi_citation_same_sentence():
    text, used = await run(["x <[1]> <[2]> y"], 2)
    assert text == "x [1] [2] y"
    assert used == [0, 1]


async def test_fuzz_chunk_splits_invariant():
    """Rewriting must be invariant to how the stream is split into
    chunks (the hard contract — reference qa_chain.py:144-195)."""
    import numpy as np

    text = (
        "The boundary <[2]> is at Cadibona <[1]> as noted <[2]>; "
        "climate varies <[3]> and <[10]> is out of bounds, "
        "while [4] literal brackets stay <[1]> untouched."
    )
    # reference output: whole text in one chunk
    expected_text, expected_used = await run([text], 5)
    rng = np.random.default_rng(5)
    for _ in range(40):
        cuts = sorted(
            set(rng.integers(1, len(text), size=int(rng.integers(1, 12))))
        )
        pieces = [
            text[a:b]
            for a, b in zip([0] + list(cuts), list(cuts) + [len(text)])
        ]
        got_text, got_used = await run(pieces, 5)
        assert got_text == expected_text, pieces
        assert got_used == expected_used
