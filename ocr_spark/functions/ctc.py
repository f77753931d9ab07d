"""CTC decoding kernels (numpy).

- ``greedy_decode_batch`` — vectorized best-path decode: per-timestep
  argmax, collapse adjacent repeats, drop blanks (the semantics of
  ``tf.nn.ctc_greedy_decoder(merge_repeated=True)`` the reference runs
  at pipline.py:359-363 / 681-683).
- ``beam_decode`` — replicates the observable behavior of the
  reference's hand-rolled CPU beam (pipline.py:31-84), including its
  quirks: blank id 20 is appended like any symbol but removed from the
  prefix before the next non-matching emission, repeated non-blank
  symbols merge, candidates are deduped by sequence keeping the
  best-scored (stable order), k best survive per step. Because a
  blank can only ever sit at the tail of a prefix (it is removed as
  soon as anything is appended after it), the reference's
  "remove first blank" is equivalent to "drop trailing blank", which
  is what we implement.

Scores accumulate -log(p) in float64, identical operation order to the
reference, so sort outcomes match bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from ocr_spark.config import ALPHABET, BEAM_K, BLANK_ID


def ids_to_text(ids) -> str:
    """Map class ids to characters (reference pipline.py:583-589)."""
    return "".join(ALPHABET[i] for i in ids)


def greedy_decode(probs: np.ndarray) -> str:
    """Best-path decode of one [T, C] probability matrix."""
    ids = probs.argmax(axis=1)
    if len(ids) == 0:
        return ""
    keep = np.empty(len(ids), dtype=bool)
    keep[0] = True
    np.not_equal(ids[1:], ids[:-1], out=keep[1:])
    ids = ids[keep]
    ids = ids[ids != BLANK_ID]
    return ids_to_text(ids)


def greedy_decode_batch(probs: np.ndarray, lengths: np.ndarray) -> list[str]:
    """Vectorized best-path decode of a padded [N, T, C] batch.

    ``lengths[i]`` gives the true timestep count of row i — the
    pad-to-max + width-vector pattern of the reference recognizer
    (utils.py:171-180, model.py:124-133).
    """
    n, t, _ = probs.shape
    if n == 0:
        return []
    ids = probs.argmax(axis=2)  # N x T
    valid = np.arange(t)[None, :] < lengths[:, None]
    changed = np.ones((n, t), dtype=bool)
    changed[:, 1:] = ids[:, 1:] != ids[:, :-1]
    keep = valid & changed & (ids != BLANK_ID)
    return [ids_to_text(ids[i][keep[i]]) for i in range(n)]


def beam_decode(probs: np.ndarray, k: int = BEAM_K) -> list[tuple[tuple[int, ...], float]]:
    """Beam decode one [T, C] probability matrix.

    Returns up to k (id-sequence, score) pairs, best first. Observable
    behavior matches reference pipline.py:31-84 (see module docstring).
    """
    neglog = -np.log(probs.astype(np.float64))
    n_classes = probs.shape[1]
    # Vectorized equivalent of the candidate double loop: scores for
    # all (beam x class) extensions in one array, stable argsort
    # (generation order -- beam-major, class-minor -- breaks ties,
    # exactly like the reference's stable list sort), then sequences
    # are materialized lazily only for the candidates actually visited
    # before k unique survivors are found.
    beam_seqs: list[tuple[int, ...]] = [()]
    beam_scores = np.zeros(1, dtype=np.float64)
    for t in range(probs.shape[0]):
        flat = (beam_scores[:, None] + neglog[t][None, :]).ravel()
        order = np.argsort(flat, kind="stable")
        new_seqs: list[tuple[int, ...]] = []
        new_scores: list[float] = []
        seen: set[tuple[int, ...]] = set()
        for idx in order:
            b, j = divmod(int(idx), n_classes)
            seq = beam_seqs[b]
            if seq and seq[-1] == j and j != BLANK_ID:
                nseq = seq
            else:
                base = seq[:-1] if (seq and seq[-1] == BLANK_ID) else seq
                nseq = base + (j,)
            if nseq not in seen:
                seen.add(nseq)
                new_seqs.append(nseq)
                new_scores.append(flat[idx])
                if len(new_seqs) == k:
                    break
        beam_seqs = new_seqs
        beam_scores = np.asarray(new_scores, dtype=np.float64)
    return list(zip(beam_seqs, (float(s) for s in beam_scores)))


def beam_decode_texts(probs: np.ndarray, k: int = BEAM_K) -> list[str]:
    """Beam decode -> candidate strings, best first (the
    ``logits_to_output`` shape, reference pipline.py:593-607; note a
    trailing blank decodes to a trailing space, as in the reference)."""
    return [ids_to_text(seq) for seq, _ in beam_decode(probs, k)]
