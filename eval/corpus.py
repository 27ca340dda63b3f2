"""Deterministic synthetic eval corpus: a multi-page "atlas" PDF + QA pairs.

The reference evaluates retrieval on ``alps_wiki.pdf`` with a parquet of
ground-truth questions (reference eval/eval_retriever.py:109-146). That
corpus is external data we neither ship nor fetch (zero egress), so the
harness synthesizes an equivalent one: every page describes a fictional
mountain with globally unique proper nouns and numeric facts, and every
question targets exactly one fact, so ground truth is unambiguous at
chunk granularity. Generation is fully deterministic (seeded), making
recall numbers reproducible across runs and machines.
"""

from dataclasses import dataclass

import numpy as np

from dial_rag_tpu.documents.pdf.writer import build_pdf

_ONSETS = ["z", "qu", "br", "v", "kr", "th", "gl", "m", "dr", "sk"]
_NUCLEI = ["ar", "el", "ol", "ir", "un", "av", "or", "ey", "au", "in"]
_CODAS = ["vok", "mar", "din", "goth", "lune", "fell", "rath", "wick",
          "stad", "pine"]

_REGIONS = ["northern", "southern", "eastern", "western", "central"]
_ROCKS = ["granite", "limestone", "basalt", "gneiss", "schist",
          "dolomite", "marble", "sandstone", "quartzite", "slate"]
_ANIMALS = ["ibex", "marmot", "chamois", "eagle", "lynx", "grouse",
            "salamander", "vulture", "hare", "fox"]


def _unique_name(rng: np.random.Generator, used: set) -> str:
    for _ in range(50):
        name = (
            rng.choice(_ONSETS) + rng.choice(_NUCLEI) + rng.choice(_CODAS)
        ).capitalize()
        if name not in used:
            used.add(name)
            return name
    # the syllable pool has 1000 combinations; large corpora get numeric
    # suffixes instead of looping forever
    base = name
    i = 2
    while f"{base}{i}" in used:
        i += 1
    name = f"{base}{i}"
    used.add(name)
    return name


@dataclass(frozen=True)
class EvalQuestion:
    question: str
    fact: str  # the unique sentence the answer lives in
    page_number: int  # 1-based


@dataclass
class EvalCorpus:
    pdf_bytes: bytes
    questions: list[EvalQuestion]
    words: list[str]  # full corpus vocabulary (for test tokenizers)


def build_corpus(n_pages: int = 20, seed: int = 0) -> EvalCorpus:
    """One mountain per page, three unique facts per mountain, one
    question per fact."""
    rng = np.random.default_rng(seed)
    used_names: set = set()
    pages = []
    questions = []
    all_text = []

    for page_idx in range(n_pages):
        name = _unique_name(rng, used_names)
        river = _unique_name(rng, used_names)
        town = _unique_name(rng, used_names)
        height = int(rng.integers(1200, 4800))
        year = int(rng.integers(1801, 1999))
        region = _REGIONS[page_idx % len(_REGIONS)]
        rock = _ROCKS[int(rng.integers(0, len(_ROCKS)))]
        animal = _ANIMALS[int(rng.integers(0, len(_ANIMALS)))]

        fact_height = (
            f"Mount {name} rises to {height} meters above sea level."
        )
        fact_first = (
            f"The first recorded ascent of Mount {name} took place in "
            f"{year}."
        )
        fact_river = (
            f"The river {river} springs from the {region} slopes of "
            f"Mount {name} and flows past the town of {town}."
        )
        filler = [
            f"Mount {name} is part of the {region} range of the atlas.",
            f"The bedrock of Mount {name} is mostly {rock}.",
            f"Hikers near Mount {name} often spot the alpine {animal}.",
            "Snow covers the upper slopes for much of the year.",
            "Mountain huts provide shelter along the main trails.",
        ]
        sentences = [fact_height, fact_first, fact_river, *filler]
        all_text.extend(sentences)

        lines = [(72.0, 720.0, 14.0, f"Mount {name}")]
        y = 690.0
        for s in sentences:
            lines.append((72.0, y, 10.0, s))
            y -= 18.0
        pages.append(lines)

        pn = page_idx + 1
        questions.append(
            EvalQuestion(
                f"How many meters tall is Mount {name}?", fact_height, pn
            )
        )
        questions.append(
            EvalQuestion(
                f"In which year was Mount {name} first climbed?",
                fact_first,
                pn,
            )
        )
        questions.append(
            EvalQuestion(
                f"Which town does the river {river} flow past?",
                fact_river,
                pn,
            )
        )

    words = sorted(
        {
            w.strip(".,?").lower()
            for text in all_text + [q.question for q in questions]
            for w in text.split()
        }
    )
    return EvalCorpus(
        pdf_bytes=build_pdf(pages, compress=True),
        questions=questions,
        words=words,
    )
