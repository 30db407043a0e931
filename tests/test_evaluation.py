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


def test_instance_ap_empty_preds_and_gt_no_crash():
    import numpy as np

    from iuvl_tpu.evaluation.instance import InstanceAPEvaluator

    ev = InstanceAPEvaluator(num_classes=3)
    # zero predictions against real gt
    ev.process(np.zeros((0, 8, 8)), np.zeros(0), np.zeros(0, int),
               np.ones((1, 8, 8), bool), np.asarray([1]))
    # real predictions against zero gt
    ev.process(np.ones((1, 8, 8), bool), np.asarray([0.9]),
               np.asarray([1]), np.zeros((0, 8, 8)), np.zeros(0, int))
    out = ev.evaluate()
    assert np.isfinite(out["AP"])


def test_semseg_union_excludes_ignore_column():
    import numpy as np

    from iuvl_tpu.evaluation.semseg import SemSegEvaluator

    ev = SemSegEvaluator(num_classes=2)
    gt = np.zeros((4, 4), np.int64)
    gt[2:] = ev.ignore_label if hasattr(ev, "ignore_label") else 2
    pred = np.zeros((4, 4), np.int64)  # class 0 everywhere, incl. ignore px
    ev.process(pred, gt)
    out = ev.evaluate()
    # Predictions on ignore pixels must not inflate the union: class 0 has
    # tp == pos_gt == pos_pred(non-ignore) == 8 -> IoU 100.
    assert out["mIoU"] == 100.0


def test_panoptic_void_overlap_subtracted_from_union():
    import numpy as np

    from iuvl_tpu.evaluation.panoptic import PanopticEvaluator

    # gt: segment 1 covers the left half; the right half is VOID (0).
    gt = np.zeros((4, 8), np.int32)
    gt[:, :4] = 1
    # pred: one segment covering everything — overlap with gt seg = 16,
    # overlap with void = 16. panopticapi union = 16+32-16-16 = 16 -> IoU 1.
    pred = np.full((4, 8), 5, np.int32)
    ev = PanopticEvaluator(thing_ids={7})
    ev.process(pred, [{"id": 5, "category_id": 7}],
               gt, [{"id": 1, "category_id": 7}])
    out = ev.evaluate()
    assert out["PQ"] > 50.0  # matched (without void subtraction IoU=0.5 fails)


def test_vqa_punctuation_replaced_by_space_when_joined():
    from iuvl_tpu.evaluation.vqa import normalize_answer

    # '/' not adjacent to a space -> becomes a space (official vqaEval rule)
    assert normalize_answer("black/white") == "black white"
    # adjacent to a space -> deleted
    assert normalize_answer("black / white") == "black  white".replace("  ", " ") or \
        normalize_answer("black / white").split() == ["black", "white"]


def test_cider_clips_repeated_ngrams():
    from iuvl_tpu.evaluation.captioning import CaptioningEvaluator

    corpus = [
        ("a dog runs on grass", ["a dog runs on the grass"]),
        ("two people ride bikes", ["two people riding bicycles"]),
        ("a bowl of fruit", ["a bowl full of fruit"]),
    ]
    ev_rep = CaptioningEvaluator()
    ev_ok = CaptioningEvaluator()
    for p, refs in corpus:
        ev_rep.process(p, refs)
        ev_ok.process(p, refs)
    ev_rep.process("red red red red red", ["a red car parked outside"])
    ev_ok.process("a red car parked outside", ["a red car parked outside"])
    rep = ev_rep.evaluate()["CIDEr"]
    ok = ev_ok.evaluate()["CIDEr"]
    assert ok > rep  # repetition must not beat the exact match


def test_instance_ap_area_range_buckets():
    """COCOeval area-range semantics: gt outside a bucket is ignored there,
    so a perfect small-object detection scores APs=100 / APm=NaN-excluded,
    and vice versa. Hand-computed per pycocotools cocoeval.py."""
    from iuvl_tpu.evaluation.instance import InstanceAPEvaluator

    ev = InstanceAPEvaluator(num_classes=1)
    small = np.zeros((64, 64), bool)
    small[:10, :10] = True  # area 100 < 32^2 -> small
    large = np.zeros((128, 128), bool)
    large[:100, :100] = True  # area 10000 in (96^2=9216, inf) -> large
    ev.process(small[None], [0.9], [0], small[None], [0])
    ev.process(large[None], [0.8], [0], large[None], [0])
    res = ev.evaluate()
    assert res["AP"] == 100.0
    assert res["APs"] == 100.0
    assert res["APl"] == 100.0
    assert res["APm"] == -1.0  # no medium gt anywhere -> uncomputable


def test_instance_ap_unmatched_det_outside_range_ignored():
    """An unmatched detection whose area is outside the bucket must not
    count as a false positive in that bucket (cocoeval dtIg)."""
    from iuvl_tpu.evaluation.instance import InstanceAPEvaluator

    ev = InstanceAPEvaluator(num_classes=1)
    small_gt = np.zeros((64, 64), bool)
    small_gt[:10, :10] = True
    small_hit = small_gt.copy()
    large_fp = np.zeros((64, 64), bool)
    large_fp[:62, :62] = True  # area 3844 (medium) — unmatched FP
    ev.process(
        np.stack([small_hit, large_fp]), [0.9, 0.95], [0, 0],
        small_gt[None], [0],
    )
    res = ev.evaluate()
    # 'small' bucket: the medium FP is ignored, the hit is perfect.
    assert res["APs"] == 100.0
    # 'all' bucket: the higher-scored FP halves precision at recall 1.
    # envelope: prec at recall>=... = 0.5 then 1*? cumulative: dets sorted
    # by score: [FP(0.95), TP(0.9)] -> tp=[0,1], fp=[1,1];
    # recall=[0,1], prec=[0,0.5] -> AP = 0.5
    assert abs(res["AP"] - 50.0) < 1e-6


def test_instance_ap_max_dets_cap():
    """Only the top-100 detections per image/class enter matching: a true
    positive ranked 101st by score must not be counted."""
    from iuvl_tpu.evaluation.instance import InstanceAPEvaluator

    ev = InstanceAPEvaluator(num_classes=1, max_dets=2)
    gt = np.zeros((8, 8), bool)
    gt[:4] = True
    junk1 = np.zeros((8, 8), bool)
    junk1[7, 7] = True
    junk2 = np.zeros((8, 8), bool)
    junk2[7, 6] = True
    # the true positive has the LOWEST score and maxDets=2 cuts it
    ev.process(np.stack([junk1, junk2, gt]), [0.9, 0.8, 0.7], [0, 0, 0],
               gt[None], [0])
    res = ev.evaluate()
    assert res["AP"] == 0.0


def test_instance_ap_matched_to_ignored_gt_is_ignored():
    """A det matching an out-of-range gt is ignored, not a false positive
    (cocoeval: gtIg propagates through the match)."""
    from iuvl_tpu.evaluation.instance import InstanceAPEvaluator

    ev = InstanceAPEvaluator(num_classes=1)
    med_gt = np.zeros((64, 64), bool)
    med_gt[:40, :40] = True  # area 1600 -> medium
    small_gt = np.zeros((64, 64), bool)
    small_gt[50:60, 50:60] = True  # area 100 -> small
    ev.process(np.stack([med_gt, small_gt]), [0.9, 0.8], [0, 0],
               np.stack([med_gt, small_gt]), [0, 0])
    res = ev.evaluate()
    # small bucket: medium det matches the (ignored-there) medium gt ->
    # ignored; small det is a TP for the only counted gt.
    assert res["APs"] == 100.0
    assert res["APm"] == 100.0
    assert res["AP"] == 100.0
