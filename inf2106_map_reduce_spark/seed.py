"""Seeded text-corpus generator with exact ground-truth counts.

Semantics port of the reference's dataset seeder
(``mapreduce/seed/CreateDataSet.java:24-59``): append one of three fixed
sentences at random until the file reaches the target byte size, and
record exact per-sentence counts, from which exact per-word counts are
derivable (the 11-word vocabulary). We use a seeded PRNG instead of
``Math.random()`` so fixtures are reproducible.
"""

from __future__ import annotations

import random
from collections import Counter
from pathlib import Path

SENTENCES: tuple[str, ...] = (
    "Sand e Kleber sao de Goaiania ",
    "Reinaldo e Karina sao de Fortaleza ",
    "e a o ",
)

# Golden per-word counts for the committed reference run on teste100K
# (mapreduce/dataset/teste100K49reduced0.txt and seed/out100K: sentence
# counts 1647/1234/1235).
GOLDEN_100K_SENTENCE_COUNTS: tuple[int, int, int] = (1647, 1234, 1235)
GOLDEN_100K_WORD_COUNTS: dict[str, int] = {
    "Fortaleza": 1234,
    "Goaiania": 1647,
    "Karina": 1234,
    "Kleber": 1647,
    "Reinaldo": 1234,
    "Sand": 1647,
    "a": 1235,
    "de": 2881,
    "e": 4116,
    "o": 1235,
    "sao": 2881,
}


def expected_word_counts(sentence_counts: tuple[int, int, int]) -> dict[str, int]:
    """Exact word multiset implied by per-sentence counts."""
    counts: Counter[str] = Counter()
    for sentence, n in zip(SENTENCES, sentence_counts):
        for word in sentence.split():
            counts[word] += n
    return dict(counts)


def generate_corpus(
    path: str | Path, target_bytes: int, seed: int = 42
) -> dict[str, int]:
    """Write a reference-style corpus of ~target_bytes; return exact
    per-word counts (the generator's ground truth, cf. ``seed/out*``)."""
    rng = random.Random(seed)
    sentence_counts = [0, 0, 0]
    parts: list[str] = []
    size = 0
    while size < target_bytes:
        idx = rng.randrange(3)
        parts.append(SENTENCES[idx])
        sentence_counts[idx] += 1
        size += len(SENTENCES[idx])
    Path(path).write_text("".join(parts), encoding="ascii")
    return expected_word_counts(tuple(sentence_counts))
