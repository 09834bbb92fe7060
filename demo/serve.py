"""Multi-task model server over demo/predictors.py — stdlib HTTP, no gradio.

Parity surface: the reference's 13 gradio apps (reference
gradio_demo/*.py) each expose one model behind a browser upload box; this
server exposes the same predictors behind one HTTP endpoint so the demos
work in this gradio-less environment and double as a minimal production
serving shell (one process, jit-compiled once per task, thread-safe
dispatch through a per-predictor lock — JAX jitted calls release the GIL
during device execution).

    python demo/serve.py --tasks classification,detection --port 8000

    GET  /                 HTML index: upload form per loaded task
    GET  /healthz          {"status": "ok", "tasks": [...]}
    POST /predict/<task>   body = raw JPEG/PNG bytes (or multipart file)
                           -> JSON (classification/detection/recognition)
                           -> PNG  (mask/matte tasks, ?format=png)

Tasks and their predictor constructor kwargs can be overridden with
--config '{"classification": {"network": "resnet18", "input_size": 64}}'
(also how tests run it with tiny models; checkpoints via
{"trained_model_path": ...}).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


_TASK_BUILDERS = {}


def _register(name):
    def deco(fn):
        _TASK_BUILDERS[name] = fn
        return fn
    return deco


@_register("classification")
def _build_classification(**kw):
    from predictors import ClassificationPredictor
    p = ClassificationPredictor(**kw)

    def run(img, query):
        topk = int(query.get("topk", 5))
        return {"topk": [{"class_index": int(i), "prob": float(s)}
                         for i, s in p(img, topk=topk)]}
    return run


@_register("detection")
def _build_detection(**kw):
    from predictors import DetectionPredictor
    p = DetectionPredictor(**kw)

    def run(img, query):
        thr = float(query.get("score_threshold", 0.3))
        boxes, classes, scores = p(img, score_threshold=thr)
        return {"detections": [
            {"box": [float(v) for v in b], "class_index": int(c),
             "score": float(s)}
            for b, c, s in zip(boxes, classes, scores)]}
    return run


@_register("semantic_segmentation")
def _build_semseg(**kw):
    from predictors import SemanticSegmentationPredictor
    p = SemanticSegmentationPredictor(**kw)

    def run(img, query):
        mask = p(img)
        if query.get("format") == "png":
            return _png(mask)
        return {"mask_shape": list(mask.shape),
                "class_histogram": {int(k): int(v) for k, v in
                                    zip(*np.unique(mask,
                                                   return_counts=True))}}
    return run


@_register("salient_object_detection")
def _build_salient(**kw):
    from predictors import BinarySegmentationPredictor
    p = BinarySegmentationPredictor(**kw)
    return _binary_run(p)


@_register("human_matting")
def _build_matting(**kw):
    from predictors import HumanMattingPredictor
    p = HumanMattingPredictor(**kw)
    return _binary_run(p)


def _binary_run(p):
    def run(img, query):
        alpha = p(img)
        if query.get("format") == "png":
            return _png((np.clip(alpha, 0.0, 1.0) * 255).astype(np.uint8))
        a = np.asarray(alpha, np.float64)
        return {"alpha_shape": list(a.shape), "alpha_mean": float(a.mean())}
    return run


@_register("face_detection")
def _build_face_detection(**kw):
    from predictors import FaceDetectionPredictor
    p = FaceDetectionPredictor(**kw)

    def run(img, query):
        thr = float(query.get("score_threshold", 0.3))
        boxes, classes, scores = p(img, score_threshold=thr)
        return {"faces": [
            {"box": [float(v) for v in b], "score": float(s)}
            for b, s in zip(boxes, scores)]}
    return run


@_register("face_parsing")
def _build_face_parsing(**kw):
    from predictors import ParsingPredictor
    return _parsing_run(ParsingPredictor(**kw))


@_register("human_parsing")
def _build_human_parsing(**kw):
    from predictors import ParsingPredictor
    kw.setdefault("network", "resnet50_pfan_human_parsing")
    return _parsing_run(ParsingPredictor(**kw))


def _parsing_run(p):
    def run(img, query):
        mask = p(img)
        if query.get("format") == "png":
            return _png(mask)
        return {"mask_shape": list(mask.shape),
                "class_histogram": {int(k): int(v) for k, v in
                                    zip(*np.unique(mask,
                                                   return_counts=True))}}
    return run


@_register("instance_segmentation")
def _build_instance_segmentation(**kw):
    from predictors import InstanceSegmentationPredictor
    p = InstanceSegmentationPredictor(**kw)

    def run(img, query):
        thr = float(query.get("score_threshold", 0.3))
        masks, classes, scores = p(img, score_threshold=thr)
        return {"instances": [
            {"class_index": int(c), "score": float(s),
             "mask_pixels": int(np.asarray(m).sum())}
            for m, c, s in zip(masks, classes, scores)]}
    return run


@_register("text_detection")
def _build_text_detection(**kw):
    from predictors import TextDetectionPredictor
    p = TextDetectionPredictor(**kw)

    def run(img, query):
        boxes, scores = p(img)
        return {"polygons": [
            {"points": np.asarray(b, np.float64).tolist(),
             "score": float(s)} for b, s in zip(boxes, scores)]}
    return run


@_register("interactive_segmentation")
def _build_sam(**kw):
    from predictors import SAMPredictor
    p = SAMPredictor(**kw)

    def run(img, query):
        # ?box=x1,y1,x2,y2 — circle-target flow (reference gradio 13.2:
        # the drawn region's bounding rect as a box prompt); otherwise
        # ?points=x,y;x,y — image-coordinate click prompts (<=9)
        rawbox = query.get("box", "")
        if rawbox.count(",") == 3:
            box = [float(v) for v in rawbox.split(",")]
            mask = p.predict_box(img, box)
            if query.get("format") == "png":
                return _png(mask * 255)
            return {"mask_shape": list(mask.shape),
                    "mask_pixels": int(mask.sum()), "box": box}
        raw = query.get("points", "")
        pts = []
        for tok in raw.split(";"):
            if "," in tok:
                x, y = tok.split(",", 1)
                pts.append((float(x), float(y)))
        if not pts:
            h, w = img.shape[:2]
            pts = [(w / 2.0, h / 2.0)]       # default: centre click
        mask = p(img, pts)
        if query.get("format") == "png":
            return _png(mask * 255)
        return {"mask_shape": list(mask.shape),
                "mask_pixels": int(mask.sum()),
                "points": [[float(x), float(y)] for x, y in pts]}
    return run


@_register("text_recognition")
def _build_text_recognition(**kw):
    from predictors import TextRecognitionPredictor
    p = TextRecognitionPredictor(**kw)

    def run(img, query):
        return {"text": p(img)}
    return run


def _png(arr):
    import cv2
    ok, buf = cv2.imencode(".png", arr)
    if not ok:
        raise ValueError("png encode failed")
    return ("image/png", bytes(buf.tobytes()))


def _decode_image(body):
    import cv2
    arr = np.frombuffer(body, np.uint8)
    img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("request body is not a decodable image")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _strip_multipart(body, content_type):
    """Extract the first file part from a multipart/form-data body."""
    if "multipart/form-data" not in (content_type or ""):
        return body
    boundary = content_type.split("boundary=")[-1].strip().strip('"').encode()
    for part in body.split(b"--" + boundary):
        idx = part.find(b"\r\n\r\n")
        if idx < 0:
            continue
        head, payload = part[:idx], part[idx + 4:]
        if b"filename=" in head:
            return payload.rstrip(b"\r\n")
    raise ValueError("no file part in multipart body")


class ModelServer:
    """Lazy-building, lock-guarded registry of task -> predict callables."""

    def __init__(self, task_configs):
        self.task_configs = dict(task_configs)
        self._runners = {}
        self._locks = {}
        self._build_lock = threading.Lock()

    @property
    def tasks(self):
        return sorted(self.task_configs)

    def warm(self):
        for t in self.tasks:
            self._get(t)

    def _get(self, task):
        with self._build_lock:
            if task not in self._runners:
                if task not in self.task_configs:
                    raise KeyError(task)
                kw = dict(self.task_configs[task] or {})
                self._runners[task] = _TASK_BUILDERS[task](**kw)
                self._locks[task] = threading.Lock()
        return self._runners[task], self._locks[task]

    def predict(self, task, body, content_type, query):
        run, lock = self._get(task)
        img = _decode_image(_strip_multipart(body, content_type))
        with lock:
            return run(img, query)


_INDEX_HTML = """<!doctype html><title>simpleaicv_tpu serve</title>
<h1>simpleaicv_tpu model server</h1>
{forms}
<p>POST an image to /predict/&lt;task&gt; — JSON out (masks: ?format=png).</p>
"""

_FORM = """<h2>{task}</h2>
<form action="/predict/{task}" method="post" enctype="multipart/form-data">
<input type="file" name="file"><input type="submit" value="predict">
</form>"""


def make_handler(server: ModelServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; tests capture stderr
            pass

        def _send(self, code, ctype, payload):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _send_json(self, code, obj):
            self._send(code, "application/json",
                       json.dumps(obj).encode("utf-8"))

        def do_GET(self):
            if self.path == "/healthz":
                return self._send_json(200, {"status": "ok",
                                             "tasks": server.tasks})
            if self.path == "/":
                forms = "".join(_FORM.format(task=t) for t in server.tasks)
                return self._send(200, "text/html",
                                  _INDEX_HTML.format(forms=forms)
                                  .encode("utf-8"))
            self._send_json(404, {"error": "not found"})

        def do_POST(self):
            if not self.path.startswith("/predict/"):
                return self._send_json(404, {"error": "not found"})
            rest = self.path[len("/predict/"):]
            task, _, qs = rest.partition("?")
            query = dict(kv.split("=", 1) for kv in qs.split("&") if "=" in kv)
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                out = server.predict(task, body,
                                     self.headers.get("Content-Type"), query)
            except KeyError:
                return self._send_json(
                    404, {"error": f"unknown task {task!r}",
                          "tasks": server.tasks})
            except ValueError as e:
                return self._send_json(400, {"error": str(e)})
            if isinstance(out, tuple):              # (content_type, bytes)
                return self._send(200, out[0], out[1])
            self._send_json(200, out)

    return Handler


def build_server(tasks, config=None, host="127.0.0.1", port=8000):
    cfg = dict(config or {})
    task_configs = {t: cfg.get(t, {}) for t in tasks}
    unknown = [t for t in task_configs if t not in _TASK_BUILDERS]
    if unknown:
        raise SystemExit(f"unknown tasks {unknown}; "
                         f"available: {sorted(_TASK_BUILDERS)}")
    model_server = ModelServer(task_configs)
    httpd = ThreadingHTTPServer((host, port), make_handler(model_server))
    return httpd, model_server


def main(argv=None):
    from simpleaicv_tpu.core.platform import apply_platform_env
    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tasks", default="classification",
                    help="comma list of " + ",".join(sorted(_TASK_BUILDERS)))
    ap.add_argument("--config", default="{}",
                    help="JSON: {task: predictor-kwargs}")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args(argv)
    httpd, model_server = build_server(
        [t.strip() for t in args.tasks.split(",") if t.strip()],
        json.loads(args.config), args.host, args.port)
    model_server.warm()                        # compile before serving
    print(f"serving {model_server.tasks} on "
          f"http://{args.host}:{httpd.server_address[1]}", flush=True)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
