"""Stochastic rank-perturbation sampling (SURVEY.md O6-O8; reference:
src/main/java/stochastic_qpp/RankSwapper.java:34-141,
AttributeValueBasedSwapper.java:21-53).

Semantics mirrored, with flagged handling:

* a "permutation" swaps one relevant-ranked doc with one nonrelevant-ranked
  doc; the identity permutation is always included; with
  TOPDOC_ALWAYS_SWAPPED rank 0 is treated as a rel rank regardless of label;
* relevance = qrels rel >= 2 (PerQueryRelDocs.isRel, :28-33);
* ALLOW_UNSORTED_TOPDOCS=true (Constants.java:74): the swap moves (doc,
  score) pairs together, producing an unsorted list; with false only the doc
  ids swap and scores stay in rank order;
* the reference samples with unseeded Math.random — our engine seeds
  np.random per (qid, draw) for determinism (SURVEY.md O6);
* the reference's selectRandomNotEqual(0, M) can return M (a latent
  out-of-bounds bug, RankSwapper.java:43); we clamp to M-1 — documented
  deviation, reachable only with probability 1/M per call.
"""

from __future__ import annotations

from zlib import crc32

import numpy as np

NUM_SHUFFLES = 50       # reference: Constants.java NUM_SHUFFLES
TOPDOC_ALWAYS_SWAPPED = True
ALLOW_UNSORTED_TOPDOCS = True


def _swap(items: list[tuple[int, float]], i: int, j: int,
          allow_unsorted: bool = ALLOW_UNSORTED_TOPDOCS):
    out = list(items)
    if allow_unsorted:
        out[i], out[j] = out[j], out[i]
    else:
        (di, si), (dj, sj) = out[i], out[j]
        out[i], out[j] = (dj, si), (di, sj)
    return out


def sample_permutations(topdocs: list[tuple[int, float]],
                        is_rel, *, topdoc_always_swapped: bool = TOPDOC_ALWAYS_SWAPPED,
                        allow_unsorted: bool = ALLOW_UNSORTED_TOPDOCS
                        ) -> list[list[tuple[int, float]]]:
    """All single-swap perturbations of a ranked list: identity + one swap per
    (rel rank, nonrel rank) pair. ``is_rel(doc_id) -> bool``."""
    rel_ranks, nonrel_ranks = set(), set()
    if topdoc_always_swapped:
        rel_ranks.add(0)
    for rank, (doc, _) in enumerate(topdocs):
        (rel_ranks if is_rel(doc) else nonrel_ranks).add(rank)
    perms = [list(topdocs)]
    for r in sorted(rel_ranks):
        for nr in sorted(nonrel_ranks):
            perms.append(_swap(topdocs, r, nr, allow_unsorted))
    return perms


def sample_one(perms: list, qid: str, draw: int) -> list:
    """Uniform sample with replacement (seeded per (qid, draw))."""
    rng = np.random.default_rng((8811, crc32(str(qid).encode()), draw))
    return perms[int(rng.integers(0, len(perms)))]


M31 = (1 << 31) - 1
_PERM_A = 1315423911       # qid multiplier (same family as qpp.methods
_PERM_B = 2654435761       # sample_order_keys — SQL-recomputable)


def perm_index(qid: str, draw: int, n_perms: int) -> int:
    """Deterministic ARITHMETIC permutation pick for the distributed
    stochastic-QPP pipeline: ((q+1)·A + (draw+1)·B) mod 2^31-1 mod n_perms,
    q = int(qid) mod M31 (crc32 for non-numeric qids). Unlike ``sample_one``
    (seeded numpy, kept for the reference-shaped API) this is recomputable
    in plain SQL, so the gate oracle can replay the exact swaps. All
    products stay < 2^62 — exact in int64 on both sides."""
    s = str(qid)
    q = (int(s) if s.isdigit() else crc32(s.encode())) % M31
    return int(((q + 1) * _PERM_A + (draw + 1) * _PERM_B) % M31) % n_perms


def chosen_swap(n_rel: int, n_nonrel: int, idx: int) -> tuple[int, int] | None:
    """Map a permutation index to (rel_ordinal, nonrel_ordinal) in the
    sorted-rank enumeration of ``sample_permutations`` (identity at 0)."""
    if idx == 0 or n_nonrel == 0:
        return None
    p = idx - 1
    return p // n_nonrel, p % n_nonrel


def shuffle_topdocs(topdocs: list[tuple[int, float]], qid: str, draw: int,
                    *, num_shuffles: int = NUM_SHUFFLES,
                    topdoc_always_swapped: bool = TOPDOC_ALWAYS_SWAPPED,
                    allow_unsorted: bool = ALLOW_UNSORTED_TOPDOCS
                    ) -> list[tuple[int, float]]:
    """The reference's shuffle(): num_shuffles successive random swaps."""
    rng = np.random.default_rng((8813, crc32(str(qid).encode()), draw))
    items = list(topdocs)
    n = len(items)
    if n < 2:
        return items
    for _ in range(num_shuffles):
        r = 0 if topdoc_always_swapped else int(rng.integers(0, n))
        nr = _select_random_not_equal(rng, r, n)
        items = _swap(items, r, nr, allow_unsorted)
    return items


def _select_random_not_equal(rng: np.random.Generator, k: int, m: int) -> int:
    if k == 0:
        # reference can return m here (bug); clamp to valid range
        return int(rng.integers(1, m))
    if k == m - 1:
        return int(rng.integers(0, m - 1))
    if rng.random() <= 0.5:
        return int(rng.integers(0, k))
    return int(rng.integers(k + 1, m))


def attribute_swapper_permutations(topdocs, attr_lookup, **kw):
    """O7: swap by a boolean document attribute (e.g. gender) instead of
    relevance (reference: AttributeValueBasedSwapper.java:21-53)."""
    return sample_permutations(topdocs, attr_lookup, **kw)
