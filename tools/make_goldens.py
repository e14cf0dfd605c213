#!/usr/bin/env python3
"""Generate golden fixtures by executing the reference's exact semantics.

Replicates, in pure stdlib Python (same float ops, same f-string formatting):
 - converter_to_yolo_data.py to_yolo_line (clip + normalize + 6dp format)
   over a slice of /root/reference/raw_data (PNG dims read from IHDR bytes,
   which is all PIL's Image.size reads for PNG);
 - Test/accuracy.ipynb `iou` + `match_detections` (greedy one-to-one) over
   the same deterministic synthetic boxes as graft.ops.SyntheticBoxes.

Outputs JSON fixtures under src/test/resources/golden/.
"""
import json, struct, os, sys

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "golden")
CLASS_IDS = {0, 1, 2, 3, 4, 5}


def png_dims(path):
    with open(path, "rb") as f:
        head = f.read(24)
    assert head[:8] == b"\x89PNG\r\n\x1a\n", path
    w, h = struct.unpack(">II", head[16:24])
    return w, h


# --- exact copy of reference to_yolo_line semantics (converter_to_yolo_data.py:81-92)
def to_yolo_line(bbox, cls_id, img_w, img_h):
    x_min, y_min, w, h = bbox
    x_min = max(0.0, min(x_min, img_w))
    y_min = max(0.0, min(y_min, img_h))
    w = max(0.0, min(w, img_w - x_min))
    h = max(0.0, min(h, img_h - y_min))
    x_center = (x_min + w / 2.0) / img_w if img_w else 0.0
    y_center = (y_min + h / 2.0) / img_h if img_h else 0.0
    w_n = w / img_w if img_w else 0.0
    h_n = h / img_h if img_h else 0.0
    return f"{cls_id} {x_center:.6f} {y_center:.6f} {w_n:.6f} {h_n:.6f}"


def convert_goldens(doc_names):
    out = []
    for name in doc_names:
        jf = os.path.join(REF, "raw_data", "jsons", name + ".json")
        pf = os.path.join(REF, "raw_data", "images", name + ".png")
        data = json.load(open(jf))
        w, h = png_dims(pf)
        lines = []
        for ann in data.get("annotations", []):
            bbox = ann.get("bbox")
            cls_id = ann.get("category_id")
            if not isinstance(bbox, list) or len(bbox) != 4:
                continue
            if cls_id not in CLASS_IDS:
                continue
            lines.append(to_yolo_line(bbox, cls_id, w, h))
        out.append({"file_name": data["file_name"], "width": w, "height": h,
                    "annotations": data.get("annotations", []),
                    "lines": lines})
    return out


# --- exact copy of notebook iou + match_detections (cell d497de3d)
def iou(boxA, boxB):
    xA = max(boxA[0], boxB[0]); yA = max(boxA[1], boxB[1])
    xB = min(boxA[2], boxB[2]); yB = min(boxA[3], boxB[3])
    inter = max(0, xB - xA) * max(0, yB - yA)
    if inter == 0:
        return 0.0
    areaA = (boxA[2] - boxA[0]) * (boxA[3] - boxA[1])
    areaB = (boxB[2] - boxB[0]) * (boxB[3] - boxB[1])
    return inter / (areaA + areaB - inter)


def match_detections(preds, gts, iou_thr=0.5):
    matched_pred = set(); matched_gt = set(); pairs = []
    for pi, p in enumerate(preds):
        p_cls, *p_box = p
        best_iou = 0.0; best_gi = -1
        for gi, g in enumerate(gts):
            if gi in matched_gt:
                continue
            g_cls, *g_box = g
            if g_cls != p_cls:
                continue
            v = iou(p_box, g_box)
            if v > best_iou:
                best_iou = v; best_gi = gi
        if best_iou >= iou_thr and best_gi >= 0:
            matched_pred.add(pi); matched_gt.add(best_gi)
            pairs.append({"pred_line": pi, "gt_line": best_gi, "iou": best_iou})
    return matched_pred, matched_gt, pairs


def synthetic_boxes(n_parts):
    """Mirror of graft.ops.SyntheticBoxes (k = p_partkey = 0..n-1)."""
    gts, preds = {}, {}
    for k in range(0, n_parts):
        page = k // 25
        line = k % 25
        cls = k % 6
        x = float(k * 37 % 960); y = float(k * 59 % 480)
        w = float(64 + k * 13 % 128); h = float(48 + k * 17 % 96)
        gts.setdefault(page, []).append((line, cls, x, y, x + w, y + h))
        px = x + float(k % 7) - 3.0; py = y + float(k % 11) - 5.0
        pw = w + float(k % 5) - 2.0; ph = h + float(k % 9) - 4.0
        preds.setdefault(page, []).append((line, cls, px, py, px + pw, py + ph))
    return gts, preds


def matcher_goldens(n_parts, iou_thr=0.5):
    gts, preds = synthetic_boxes(n_parts)
    pages = []
    for page in sorted(set(gts) | set(preds)):
        g = [t[1:] for t in sorted(gts.get(page, []))]
        p = [t[1:] for t in sorted(preds.get(page, []))]
        g_lines = [t[0] for t in sorted(gts.get(page, []))]
        p_lines = [t[0] for t in sorted(preds.get(page, []))]
        mp, mg, pairs = match_detections(p, g, iou_thr)
        tp = len(mp)
        pages.append({
            "page": f"page_{page}",
            "num_predictions": len(p), "num_gt": len(g),
            "tp": tp, "fp": len(p) - tp, "fn": len(g) - len(mg),
            "pairs": [{"pred_line": p_lines[x["pred_line"]],
                       "gt_line": g_lines[x["gt_line"]],
                       "iou": x["iou"]} for x in pairs]})
    return pages


# --- exact copy of predictions_to_json.py:62-72,91-128 semantics
CLASS_MAP = {0: "Background", 1: "Text", 2: "Title", 3: "List", 4: "Table", 5: "Figure"}


def yolo_to_bbox_abs(xc, yc, w, h, img_w, img_h):
    x_min = (xc - w / 2.0) * img_w
    y_min = (yc - h / 2.0) * img_h
    bw = w * img_w
    bh = h * img_h
    x_min = max(0.0, min(x_min, img_w))
    y_min = max(0.0, min(y_min, img_h))
    bw = max(0.0, min(bw, img_w - x_min))
    bh = max(0.0, min(bh, img_h - y_min))
    return [x_min, y_min, bw, bh]


def parse_prediction_line(line):
    parts = line.strip().split()
    if len(parts) != 6:
        return None
    try:
        return (int(parts[0]), float(parts[1]), float(parts[2]),
                float(parts[3]), float(parts[4]), float(parts[5]))
    except ValueError:
        return None


def predictions_goldens(seed=7, n_images=40, conf_thr=0.25, round_dp=2):
    """Synthesize label files (with malformed/edge lines mixed in), run the
    reference conversion logic, emit (label_text, image dims, expected doc).
    """
    import random
    rnd = random.Random(seed)
    out = []
    for i in range(n_images):
        stem = f"img_{i:04d}"
        img_w = rnd.choice([640, 800, 1024, 1280])
        img_h = rnd.choice([480, 512, 768, 960])
        lines = []
        n = rnd.randint(0, 12)
        for _ in range(n):
            cls = rnd.randint(0, 7)              # some invalid (6,7)
            xc = round(rnd.uniform(-0.1, 1.1), 6)
            yc = round(rnd.uniform(-0.1, 1.1), 6)
            w = round(rnd.uniform(0.0, 0.5), 6)
            h = round(rnd.uniform(0.0, 0.5), 6)
            conf = round(rnd.uniform(0.0, 1.0), 6)
            lines.append(f"{cls} {xc:.6f} {yc:.6f} {w:.6f} {h:.6f} {conf:.6f}")
        if rnd.random() < 0.3:
            lines.insert(rnd.randint(0, len(lines)), "")             # blank
        if rnd.random() < 0.3:
            lines.append("1 0.5 0.5 0.1 0.1")                        # 5 tokens
        if rnd.random() < 0.3:
            lines.append("x 0.5 0.5 0.1 0.1 0.9")                    # non-numeric
        annotations = []
        for raw in lines:
            if not raw.strip():
                continue
            parsed = parse_prediction_line(raw)
            if not parsed:
                continue
            cls_id, xc, yc, w, h, conf = parsed
            if conf < conf_thr:
                continue
            if cls_id not in CLASS_MAP:
                continue
            bbox = yolo_to_bbox_abs(xc, yc, w, h, img_w, img_h)
            if round_dp >= 0:
                bbox = [round(v, round_dp) for v in bbox]
            annotations.append({"bbox": bbox, "category_id": cls_id,
                                "category_name": CLASS_MAP[cls_id]})
        expected = {"file_name": stem + ".png",
                    "annotations": annotations,
                    "corruption": {"type": "none", "severity": 0}}
        out.append({
            "file_name": stem + ".png", "stem": stem,
            "width": img_w, "height": img_h,
            "label_text": "\n".join(lines) + ("\n" if lines else ""),
            "expected": expected,
            # the reference sink's EXACT bytes (predictions_to_json.py:
            # json.dump(..., ensure_ascii=False, indent=2)) — the byte-parity
            # golden for the engine's text-assembled JSON sink
            "expected_json": json.dumps(expected, ensure_ascii=False,
                                        indent=2)})
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    # slice: first 40 docs + a spread across the corpus for corruption variety
    all_jsons = sorted(os.listdir(os.path.join(REF, "raw_data", "jsons")))
    stems = [n[:-5] for n in all_jsons if n.endswith(".json")]
    # slice: first 40 + an even spread across the corpus
    names = stems[:40] + stems[40::max(1, len(stems) // 20)]
    names = [n for n in dict.fromkeys(names)
             if os.path.exists(os.path.join(REF, "raw_data", "images", n + ".png"))]
    docs = convert_goldens(names)
    json.dump(docs, open(os.path.join(OUT, "convert_labels.json"), "w"), indent=1)
    n_boxes = sum(len(d["lines"]) for d in docs)
    print(f"convert_labels.json: {len(docs)} docs, {n_boxes} label lines")

    preds = predictions_goldens()
    json.dump(preds, open(os.path.join(OUT, "predictions_docs.json"), "w"), indent=1)
    n_anns = sum(len(p["expected"]["annotations"]) for p in preds)
    print(f"predictions_docs.json: {len(preds)} images, {n_anns} kept annotations")

    for thr, fname in ((0.5, "greedy_match.json"), (0.9, "greedy_match_thr09.json")):
        pages = matcher_goldens(200, thr)
        json.dump(pages, open(os.path.join(OUT, fname), "w"), indent=1)
        print(f"{fname}: {len(pages)} pages, "
              f"tp={sum(p['tp'] for p in pages)} fp={sum(p['fp'] for p in pages)} "
              f"fn={sum(p['fn'] for p in pages)}")


if __name__ == "__main__":
    main()
