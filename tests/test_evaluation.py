import numpy as np

from iuvl_tpu.evaluation import (
    CaptioningEvaluator,
    ClassificationEvaluator,
    GroundingEvaluator,
    InstanceAPEvaluator,
    InteractiveEvaluator,
    PanopticEvaluator,
    RetrievalEvaluator,
    SemSegEvaluator,
)
from iuvl_tpu.data.tokenizer import HashWordTokenizer, build_tokenizer


def test_semseg_perfect_and_half():
    ev = SemSegEvaluator(num_classes=2)
    gt = np.array([[0, 0], [1, 1]])
    ev.process(gt, gt)
    res = ev.evaluate()
    assert res["mIoU"] == 100.0 and res["pACC"] == 100.0

    ev.reset()
    pred = np.array([[0, 1], [1, 1]])
    ev.process(pred, gt)
    res = ev.evaluate()
    # class0: inter 1, union 2 -> 0.5; class1: inter 2, union 3 -> 2/3
    assert abs(res["mIoU"] - 100 * (0.5 + 2 / 3) / 2) < 1e-6


def test_grounding_metrics():
    ev = GroundingEvaluator()
    m = np.zeros((4, 4), bool)
    m[:2] = True
    ev.process(m, m)  # IoU 1.0
    half = m.copy()
    half[0] = False  # pred covers half of gt
    ev.process(half, m)  # IoU 0.5
    res = ev.evaluate()
    assert abs(res["mIoU"] - 75.0) < 1e-6
    assert res["precision@0.5"] == 100.0
    assert res["precision@0.9"] == 50.0


def test_interactive_noc():
    ev = InteractiveEvaluator(max_clicks=5, iou_thresholds=(0.8,))
    ev.process(np.array([0.2, 0.5, 0.85, 0.9, 0.9]))  # reaches 0.8 at click 3
    ev.process(np.array([0.1, 0.2, 0.3, 0.4, 0.5]))  # never
    res = ev.evaluate()
    assert res["NoC@0.8"] == (3 + 5) / 2
    assert res["Fail@0.8"] == 50.0


def test_retrieval_perfect():
    ev = RetrievalEvaluator(ks=(1,))
    rs = np.random.RandomState(0)
    embs = rs.randn(4, 8)
    for i in range(4):
        ev.process(embs[i], i, [embs[i] + 0.01 * rs.randn(8)], [i])
    res = ev.evaluate()
    assert res["tr@1"] == 100.0 and res["ir@1"] == 100.0


def test_classification():
    ev = ClassificationEvaluator(ks=(1,))
    logits = np.array([[0.1, 0.9], [0.8, 0.2]])
    ev.process(logits, np.array([1, 1]))
    assert ev.evaluate()["top1"] == 50.0


def test_captioning_identity_scores_high():
    ev = CaptioningEvaluator()
    ev.process("a cat sits on the mat", ["a cat sits on the mat"])
    ev.process("a dog runs fast", ["a dog runs in the park fast"])
    res = ev.evaluate()
    assert res["BLEU4"] > 20.0
    assert res["CIDEr"] > 0.0


def test_panoptic_perfect():
    ev = PanopticEvaluator(thing_ids={1})
    seg = np.zeros((8, 8), np.int32)
    seg[:4] = 1
    seg[4:] = 2
    info = [
        {"id": 1, "category_id": 1},
        {"id": 2, "category_id": 0},
    ]
    ev.process(seg, info, seg, info)
    res = ev.evaluate()
    assert res["PQ"] == 100.0 and res["PQ_th"] == 100.0 and res["PQ_st"] == 100.0


def test_instance_ap_perfect():
    ev = InstanceAPEvaluator(num_classes=2)
    masks = np.zeros((2, 8, 8), bool)
    masks[0, :4] = True
    masks[1, 4:] = True
    ev.process(masks, [0.9, 0.8], [0, 1], masks, [0, 1])
    res = ev.evaluate()
    assert res["AP"] == 100.0


def test_tokenizer_fallback_roundtrip():
    tok = build_tokenizer()
    out = tok(["a photo of a cat", "dog"])
    assert out["input_ids"].shape == (2, 77)
    assert out["input_ids"][0, 0] == 49406  # sot
    assert (out["input_ids"] == 49407).sum() == 2  # one eot each
    # eot is argmax id per row (required by the CLIP pooling convention)
    assert (out["input_ids"].argmax(1) == out["attention_mask"].sum(1) - 1).all()
    if isinstance(tok, HashWordTokenizer):
        dec = tok.batch_decode(out["input_ids"], skip_special_tokens=True)
        assert "cat" in dec[0]


def test_vqa_evaluator():
    from iuvl_tpu.evaluation.vqa import VQAEvaluator, normalize_answer

    assert normalize_answer("The Dog!") == "dog"
    assert normalize_answer("Two") == "2"
    assert normalize_answer("isnt") == "isn't"
    ev = VQAEvaluator()
    ev.process("dog", ["dog"] * 5 + ["cat"] * 5)
    res = ev.evaluate()
    assert 0 < res["vqa_accuracy"] <= 100


def test_noun_phrases():
    from iuvl_tpu.data.nouns import extract_noun_phrases, noun_prompts

    phrases = extract_noun_phrases("a brown dog is playing with the red ball")
    assert any("dog" in p for p in phrases)
    assert any("ball" in p for p in phrases)
    _, prompts = noun_prompts("a cat on the mat")
    assert all(p.startswith("a photo of the") for p in prompts)
