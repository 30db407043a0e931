"""Image-text retrieval evaluator (ir@k / tr@k).

Parity target: /root/reference/datasets/evaluation/retrieval_evaluation.py
(:23-259): gather all image and text embeddings, compute the full similarity
matrix, report image-retrieval and text-retrieval recall@{1,5,10}.
"""

from __future__ import annotations

import numpy as np


class RetrievalEvaluator:
    def __init__(self, ks=(1, 5, 10)):
        self.ks = ks
        self.reset()

    def reset(self):
        self.image_embs: list[np.ndarray] = []
        self.text_embs: list[np.ndarray] = []
        self.image_ids: list[int] = []
        self.text_image_ids: list[int] = []

    def process(self, image_emb, image_id, text_embs, text_image_ids):
        self.image_embs.append(np.asarray(image_emb))
        self.image_ids.append(int(image_id))
        for e, tid in zip(np.asarray(text_embs), text_image_ids):
            self.text_embs.append(e)
            self.text_image_ids.append(int(tid))

    def merge(self, other: "RetrievalEvaluator"):
        self.image_embs.extend(other.image_embs)
        self.image_ids.extend(other.image_ids)
        self.text_embs.extend(other.text_embs)
        self.text_image_ids.extend(other.text_image_ids)

    def evaluate(self) -> dict[str, float]:
        if not self.image_embs or not self.text_embs:
            return {}
        vi = np.stack(self.image_embs)
        vt = np.stack(self.text_embs)
        vi = vi / (np.linalg.norm(vi, axis=-1, keepdims=True) + 1e-7)
        vt = vt / (np.linalg.norm(vt, axis=-1, keepdims=True) + 1e-7)
        sim = vi @ vt.T  # (I, T)
        img_ids = np.asarray(self.image_ids)
        txt_ids = np.asarray(self.text_image_ids)

        out = {}
        # Text retrieval: for each image, rank texts.
        order_t = np.argsort(-sim, axis=1)
        match_t = txt_ids[order_t] == img_ids[:, None]
        # Image retrieval: for each text, rank images.
        order_i = np.argsort(-sim.T, axis=1)
        match_i = img_ids[order_i] == txt_ids[:, None]
        for k in self.ks:
            out[f"tr@{k}"] = 100.0 * float(match_t[:, :k].any(1).mean())
            out[f"ir@{k}"] = 100.0 * float(match_i[:, :k].any(1).mean())
        return out
