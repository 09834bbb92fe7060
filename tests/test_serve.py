"""The HTTP serving layer (demo/serve.py): real sockets, real predictors.

Parity: the reference's gradio apps expose one model behind an upload box
(reference gradio_demo/*.py); here the stdlib server is driven end-to-end
with an in-process ThreadingHTTPServer and urllib."""

import json
import threading
import urllib.request

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def server():
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))
    from serve import build_server
    httpd, model_server = build_server(
        ["classification"],
        config={"classification": {"network": "resnet18", "num_classes": 7,
                                   "input_size": 32}},
        port=0)                                      # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _jpeg_bytes(seed=0, hw=40):
    img = np.random.RandomState(seed).randint(0, 255, (hw, hw, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return bytes(buf.tobytes())


def test_healthz_and_index(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        out = json.loads(r.read())
    assert out == {"status": "ok", "tasks": ["classification"]}
    with urllib.request.urlopen(server + "/") as r:
        page = r.read().decode()
    assert "/predict/classification" in page


def test_predict_classification_raw_body(server):
    req = urllib.request.Request(server + "/predict/classification?topk=3",
                                 data=_jpeg_bytes(),
                                 headers={"Content-Type": "image/jpeg"})
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert len(out["topk"]) == 3
    probs = [e["prob"] for e in out["topk"]]
    assert probs == sorted(probs, reverse=True)
    assert all(0.0 <= p <= 1.0 for p in probs)
    assert all(0 <= e["class_index"] < 7 for e in out["topk"])


def test_predict_multipart_form(server):
    boundary = "xBOUNDARYx"
    payload = (f"--{boundary}\r\nContent-Disposition: form-data; "
               f'name="file"; filename="a.jpg"\r\n'
               f"Content-Type: image/jpeg\r\n\r\n").encode() \
        + _jpeg_bytes(1) + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        server + "/predict/classification", data=payload,
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert len(out["topk"]) == 5


def test_unknown_task_404_and_bad_image_400(server):
    req = urllib.request.Request(server + "/predict/nope", data=b"x")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 404
    req = urllib.request.Request(server + "/predict/classification",
                                 data=b"not an image")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400


def test_concurrent_requests(server):
    """ThreadingHTTPServer + per-predictor lock: concurrent posts all
    succeed and agree with the serial answer."""
    body = _jpeg_bytes(2)
    results = []

    def post():
        req = urllib.request.Request(server + "/predict/classification",
                                     data=body)
        with urllib.request.urlopen(req) as r:
            results.append(json.loads(r.read()))

    threads = [threading.Thread(target=post) for _ in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert len(results) == 4
    assert all(r == results[0] for r in results)


def test_salient_png_output():
    """Mask tasks return PNG bytes with ?format=png (and alpha stats JSON
    otherwise) — served through a real socket on a small PFAN."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))
    from serve import build_server
    httpd, ms = build_server(
        ["salient_object_detection"],
        config={"salient_object_detection": {
            "network": "resnet18_pfan_segmentation", "input_size": 64}},
        port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        body = _jpeg_bytes(3, hw=48)
        req = urllib.request.Request(
            base + "/predict/salient_object_detection", data=body)
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["alpha_shape"] == [48, 48]
        assert 0.0 <= out["alpha_mean"] <= 1.0
        req = urllib.request.Request(
            base + "/predict/salient_object_detection?format=png", data=body)
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "image/png"
            png = r.read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        arr = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_GRAYSCALE)
        assert arr.shape == (48, 48)
    finally:
        httpd.shutdown()


def test_sam_point_prompt_endpoint():
    """The interactive-segmentation endpoint accepts ?points=x,y;x,y click
    prompts and returns mask stats / PNG — the reference's flagship gradio
    app served over plain HTTP (tiny SAM-B encoder for speed)."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))
    from serve import build_server
    httpd, ms = build_server(
        ["interactive_segmentation"],
        config={"interactive_segmentation": {
            "network": "sam_b", "image_size": 64,
            "image_encoder_embedding_planes": 64,
            "image_encoder_block_nums": 2, "image_encoder_head_nums": 2,
            "image_encoder_window_size": 2,
            "image_encoder_global_attn_indexes": (1,),
            "prompt_encoder_embedding_planes": 64}},
        port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        body = _jpeg_bytes(5, hw=48)
        req = urllib.request.Request(
            base + "/predict/interactive_segmentation?points=10,12;30,20",
            data=body)
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["mask_shape"] == [48, 48]
        assert out["points"] == [[10.0, 12.0], [30.0, 20.0]]
        assert 0 <= out["mask_pixels"] <= 48 * 48
        req = urllib.request.Request(
            base + "/predict/interactive_segmentation?format=png", data=body)
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "image/png"
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
        # circle-target flow (reference gradio 13.2): box prompt from the
        # drawn region's bounding rect
        req = urllib.request.Request(
            base + "/predict/interactive_segmentation?box=8,10,36,40",
            data=body)
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["box"] == [8.0, 10.0, 36.0, 40.0]
        assert out["mask_shape"] == [48, 48]
        assert 0 <= out["mask_pixels"] <= 48 * 48
    finally:
        httpd.shutdown()


def test_remaining_task_endpoints_smoke():
    """face_detection, face_parsing, instance_segmentation and
    text_detection endpoints all serve JSON through real sockets on small
    models (completes the 13-app reference demo surface over HTTP)."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))
    from serve import build_server
    httpd, ms = build_server(
        ["face_detection", "face_parsing", "instance_segmentation",
         "text_detection"],
        config={
            "face_detection": {"network": "resnet18_retinaface",
                               "input_size": 64},
            "face_parsing": {"network": "resnet18_pfan_face_parsing",
                             "num_classes": 5, "input_size": 64},
            "instance_segmentation": {"network": "resnet18_solov2",
                                      "num_classes": 4, "input_size": 64},
            "text_detection": {"network": "resnet18_dbnet",
                               "input_size": 64},
        }, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    body = _jpeg_bytes(7, hw=52)
    try:
        for task, key in (("face_detection", "faces"),
                          ("face_parsing", "mask_shape"),
                          ("instance_segmentation", "instances"),
                          ("text_detection", "polygons")):
            req = urllib.request.Request(base + f"/predict/{task}",
                                         data=body)
            with urllib.request.urlopen(req) as r:
                out = json.loads(r.read())
            assert key in out, (task, out)
    finally:
        httpd.shutdown()
