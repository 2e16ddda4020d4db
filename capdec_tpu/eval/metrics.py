"""Captioning metrics: BLEU-1..4, ROUGE-L, CIDEr-D — implemented in-repo.

The reference computes metrics through the external pycocoevalcap repo
(README.md:74-78) and only emits prediction/GT JSON. Here the standard
corpus scorers are first-party so evaluation is one command:
  * BLEU with the COCO-eval conventions (corpus-level, closest reference
    length for the brevity penalty)
  * ROUGE-L (LCS F-score, beta=1.2)
  * CIDEr-D (tf-idf 1-4grams, length gaussian penalty sigma=6, count
    clipping, *10 scaling)
METEOR and SPICE require external resources (paraphrase tables / a Java
scene-graph parser) and are intentionally not re-implemented; use
pycocoevalcap for those two if installed.

Inputs use the COCO format: {image_id: [captions...]} for both candidates
(single-element lists) and references. Tokenization approximates the PTB
tokenizer: lowercase, strip punctuation, whitespace split.
"""
from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

_PUNCT = re.compile(r"[^\w\s]")


def ptb_tokenize(caption: str) -> List[str]:
    return _PUNCT.sub(" ", caption.lower()).split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


# ---------------------------------------------------------------------------
# BLEU
# ---------------------------------------------------------------------------


def bleu(candidates: Dict, references: Dict, max_n: int = 4) -> List[float]:
    """Corpus BLEU-1..max_n (COCO conventions)."""
    clipped = [0] * max_n
    totals = [0] * max_n
    cand_len = 0
    ref_len = 0
    for img_id, cands in candidates.items():
        cand = ptb_tokenize(cands[0])
        refs = [ptb_tokenize(r) for r in references[img_id]]
        cand_len += len(cand)
        # closest reference length (ties -> shorter)
        ref_len += min((abs(len(r) - len(cand)), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            cgrams = _ngrams(cand, n)
            max_ref = Counter()
            for r in refs:
                for g, c in _ngrams(r, n).items():
                    max_ref[g] = max(max_ref[g], c)
            clipped[n - 1] += sum(min(c, max_ref[g]) for g, c in cgrams.items())
            totals[n - 1] += max(0, len(cand) - n + 1)
    bp = 1.0 if cand_len > ref_len else math.exp(1 - ref_len / max(1, cand_len))
    scores = []
    log_sum = 0.0
    for n in range(max_n):
        p = clipped[n] / totals[n] if totals[n] > 0 else 0.0
        # tiny epsilon as in the coco-eval implementation to avoid log(0)
        log_sum += math.log(max(p, 1e-16))
        scores.append(bp * math.exp(log_sum / (n + 1)))
    return scores


# ---------------------------------------------------------------------------
# ROUGE-L
# ---------------------------------------------------------------------------


def _lcs_len(a: List[str], b: List[str]) -> int:
    dp = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        prev = 0
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = prev + 1 if a[i - 1] == b[j - 1] else max(dp[j], dp[j - 1])
            prev = cur
    return dp[len(b)]


def rouge_l(candidates: Dict, references: Dict, beta: float = 1.2) -> float:
    scores = []
    for img_id, cands in candidates.items():
        cand = ptb_tokenize(cands[0])
        best = 0.0
        for ref in references[img_id]:
            r = ptb_tokenize(ref)
            lcs = _lcs_len(cand, r)
            if lcs == 0:
                continue
            prec = lcs / len(cand) if cand else 0.0
            rec = lcs / len(r) if r else 0.0
            f = ((1 + beta ** 2) * prec * rec) / (rec + beta ** 2 * prec)
            best = max(best, f)
        scores.append(best)
    return sum(scores) / max(1, len(scores))


# ---------------------------------------------------------------------------
# CIDEr-D
# ---------------------------------------------------------------------------


def cider_d(candidates: Dict, references: Dict, max_n: int = 4,
            sigma: float = 6.0) -> float:
    # document frequencies over reference sets
    df: List[Counter] = [Counter() for _ in range(max_n)]
    ref_tokens = {}
    for img_id, refs in references.items():
        toks = [ptb_tokenize(r) for r in refs]
        ref_tokens[img_id] = toks
        for n in range(max_n):
            seen = set()
            for r in toks:
                seen.update(_ngrams(r, n + 1).keys())
            for g in seen:
                df[n][g] += 1
    num_imgs = max(1, len(references))
    log_num = math.log(num_imgs)

    def tfidf_vec(tokens: List[str]) -> Tuple[List[Dict], List[float], int]:
        vecs, norms = [], []
        for n in range(max_n):
            grams = _ngrams(tokens, n + 1)
            vec = {}
            norm = 0.0
            for g, c in grams.items():
                idf = log_num - math.log(max(1.0, df[n][g]))
                w = c * idf
                vec[g] = w
                norm += w * w
            vecs.append(vec)
            norms.append(math.sqrt(norm))
        return vecs, norms, len(tokens)

    scores = []
    for img_id, cands in candidates.items():
        c_vec, c_norm, c_len = tfidf_vec(ptb_tokenize(cands[0]))
        img_score = 0.0
        refs = ref_tokens[img_id]
        for r_toks in refs:
            r_vec, r_norm, r_len = tfidf_vec(r_toks)
            sim_total = 0.0
            for n in range(max_n):
                # CIDEr-D: clip candidate counts at reference counts
                num = sum(min(w, r_vec[n].get(g, 0.0)) * r_vec[n].get(g, 0.0)
                          for g, w in c_vec[n].items())
                if c_norm[n] > 0 and r_norm[n] > 0:
                    sim = num / (c_norm[n] * r_norm[n])
                else:
                    sim = 0.0
                delta = c_len - r_len
                sim *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
                sim_total += sim
            img_score += sim_total / max_n
        scores.append(10.0 * img_score / max(1, len(refs)))
    return sum(scores) / max(1, len(scores))


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------


def score_predictions(predictions: List[dict], gt_metrics_format: dict
                      ) -> Dict[str, float]:
    """Score prediction JSON [{"caption","image_id"}] against a reference
    `_metrics_format.json` ({"images":[{"id"}],"annotations":[...]}, the
    format emitted by the Karpathy parser — parse_karpathy.py:33-37)."""
    refs = defaultdict(list)
    for a in gt_metrics_format["annotations"]:
        refs[int(a["image_id"])].append(a["caption"])
    cands = {}
    for p in predictions:
        img = int(p["image_id"])
        if img in refs and img not in cands:
            cands[img] = [p["caption"]]
    refs = {k: v for k, v in refs.items() if k in cands}
    b = bleu(cands, refs)
    return {
        "Bleu_1": b[0], "Bleu_2": b[1], "Bleu_3": b[2], "Bleu_4": b[3],
        "ROUGE_L": rouge_l(cands, refs),
        "CIDEr": cider_d(cands, refs),
        "num_images": float(len(cands)),
    }
