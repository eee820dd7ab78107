"""Self-contained metric primitives for the evaluation suite.

The reference eval stack (ref zipvoice/eval/) wraps big pretrained scorers
(WavLM-ECAPA, HuBERT/Whisper/Paraformer ASR, UTMOS).  The wrappers live in
wer.py / sim.py / mos.py (model downloads required); the pure math —
edit-distance WER, cpWER speaker-permutation, cosine similarity, mel MSE —
is here and fully offline-testable.
"""

from __future__ import annotations

import re
from itertools import permutations
from typing import Dict, List, Sequence, Tuple

import numpy as np


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance (substitution/insertion/deletion cost 1)."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def edit_ops(ref: Sequence, hyp: Sequence) -> Tuple[int, int, int]:
    """(substitutions, deletions, insertions) of the minimal alignment —
    the jiwer compute_measures counts the reference WER scripts report
    (ref eval/wer/seedtts.py:154-188)."""
    n, m = len(ref), len(hyp)
    # dp[i][j] = (cost, subs, dels, inss)
    prev = [(j, 0, 0, j) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, i, 0)] + [None] * m
        for j in range(1, m + 1):
            if ref[i - 1] == hyp[j - 1]:
                cand = [(prev[j - 1][0],) + prev[j - 1][1:]]
            else:
                c = prev[j - 1]
                cand = [(c[0] + 1, c[1] + 1, c[2], c[3])]
            d = prev[j]
            cand.append((d[0] + 1, d[1], d[2] + 1, d[3]))
            s = cur[j - 1]
            cand.append((s[0] + 1, s[1], s[2], s[3] + 1))
            cur[j] = min(cand)
        prev = cur
    return prev[m][1], prev[m][2], prev[m][3]


def normalize_transcript(text: str) -> List[str]:
    """ASR-style normalization: lowercase, strip punctuation, split."""
    text = text.lower()
    text = re.sub(r"[^\w\s']", " ", text)
    return text.split()


def wer(ref_text: str, hyp_text: str) -> Tuple[float, int, int]:
    """(wer, errors, ref_len) on normalized word sequences (cf. jiwer usage,
    ref eval/wer/hubert.py)."""
    ref = normalize_transcript(ref_text)
    hyp = normalize_transcript(hyp_text)
    errs = edit_distance(ref, hyp)
    return errs / max(len(ref), 1), errs, len(ref)


def corpus_wer(pairs: Sequence[Tuple[str, str]]) -> float:
    errs = 0
    total = 0
    for ref_text, hyp_text in pairs:
        _, e, n = wer(ref_text, hyp_text)
        errs += e
        total += n
    return errs / max(total, 1)


def split_dialog_turns(text: str) -> Dict[str, str]:
    """Split an [S1]/[S2]-tagged transcript into per-speaker concatenations
    (ref eval/wer/dialog.py:215-273 cpWER preprocessing)."""
    parts = re.split(r"(\[S[12]\])", text)
    spk = None
    out = {"[S1]": [], "[S2]": []}
    for p in parts:
        if p in ("[S1]", "[S2]"):
            spk = p
        elif spk is not None and p.strip():
            out[spk].append(p.strip())
    return {k: " ".join(v) for k, v in out.items()}


def cp_wer(ref_text: str, hyp_text: str) -> float:
    """Concatenated-minimum-permutation WER over the two-speaker split
    (ref eval/wer/dialog.py): min WER over speaker assignments."""
    ref = split_dialog_turns(ref_text)
    hyp = split_dialog_turns(hyp_text)
    best = float("inf")
    for perm in permutations(["[S1]", "[S2]"]):
        errs, total = 0, 0
        for r_spk, h_spk in zip(["[S1]", "[S2]"], perm):
            _, e, n = wer(ref[r_spk], hyp[h_spk])
            errs += e
            total += n
        best = min(best, errs / max(total, 1))
    return best


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def mel_mse(a: np.ndarray, b: np.ndarray) -> float:
    """North-star fidelity metric: MSE between mel feature matrices
    (BASELINE.md: < 1e-3 vs the reference on the same noise)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    n = min(a.shape[0], b.shape[0])
    return float(np.mean((a[:n] - b[:n]) ** 2))
