"""Single-image predictors — the serving layer (parity: reference
gradio_demo/*.py, 13 apps at 2,271 LoC: module-level model build +
load_state_dict + cv2 preprocess + single-image forward + draw).

Each predictor wraps ONE jitted forward (compiled once, reused per request);
the gradio UIs in demo/gradio_*.py are thin shells over these, so serving
works headless too.
"""

from __future__ import annotations

import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simpleaicv_tpu.core.registry import MODELS, BACKBONES, DECODERS


def _load_params(variables, trained_model_path):
    if trained_model_path:
        import jax.numpy as _jnp
        import orbax.checkpoint as ocp
        ckpt = ocp.StandardCheckpointer()
        try:  # best checkpoints store {params, metric}
            restored = ckpt.restore(trained_model_path, {
                "params": variables["params"],
                "metric": _jnp.zeros((), _jnp.float32)})
        except BaseException:
            restored = ckpt.restore(trained_model_path,
                                    {"params": variables["params"]})
        variables = {**variables, "params": restored["params"]}
    return variables


class ClassificationPredictor:
    """Parity: gradio_demo/1.gradio_classify_single_image.py."""

    def __init__(self, network="resnet50", num_classes=1000, input_size=224,
                 trained_model_path=""):
        self.input_size = input_size
        self.model = BACKBONES.create(network, num_classes=num_classes)
        x0 = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        variables = jax.jit(lambda r, x: self.model.init(
            {"params": r}, x, False))(jax.random.PRNGKey(0), x0)
        self.variables = _load_params(variables, trained_model_path)
        self._forward = jax.jit(
            lambda v, x: jax.nn.softmax(self.model.apply(v, x, False), -1))

    def __call__(self, image_rgb: np.ndarray, topk: int = 5):
        s = self.input_size
        img = cv2.resize(image_rgb.astype(np.float32), (s, s)) / 255.0
        probs = np.asarray(self._forward(self.variables, img[None]))[0]
        idx = np.argsort(-probs)[:topk]
        return [(int(i), float(probs[i])) for i in idx]


class DetectionPredictor:
    """Parity: gradio_demo/3.gradio_detect_single_image.py (retina/yolo
    resize + decode + boxes)."""

    def __init__(self, network="resnet50_fcos", decoder="FCOSDecoder",
                 num_classes=80, input_size=800, trained_model_path="",
                 decoder_kwargs=None):
        self.input_size = input_size
        self.model = MODELS.create(network, num_classes=num_classes)
        x0 = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        variables = jax.jit(lambda r, x: self.model.init(
            {"params": r}, x, False))(jax.random.PRNGKey(0), x0)
        self.variables = _load_params(variables, trained_model_path)
        self.decoder = DECODERS.create(decoder, **(decoder_kwargs or {}))
        self._forward = jax.jit(lambda v, x: self.model.apply(v, x, False))

    def __call__(self, image_rgb: np.ndarray, score_threshold: float = 0.3):
        h, w = image_rgb.shape[:2]
        factor = self.input_size / max(h, w)
        nh, nw = int(round(h * factor)), int(round(w * factor))
        resized = cv2.resize(image_rgb.astype(np.float32), (nw, nh))
        canvas = np.zeros((self.input_size, self.input_size, 3), np.float32)
        canvas[:nh, :nw] = resized / 255.0
        outs = self._forward(self.variables, jnp.asarray(canvas[None]))
        scores, classes, boxes = self.decoder(outs)
        keep = scores[0] > score_threshold
        return (boxes[0][keep] / factor, classes[0][keep], scores[0][keep])

    def draw(self, image_rgb, boxes, classes, scores):
        img = image_rgb.copy().astype(np.uint8)
        for box, cls, score in zip(boxes, classes, scores):
            x1, y1, x2, y2 = box.astype(int)
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
            cv2.putText(img, f"{int(cls)}:{score:.2f}", (x1, max(y1 - 4, 0)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
        return img


class SemanticSegmentationPredictor:
    """Parity: gradio_demo/4.gradio_semantic_segmentation_single_image.py."""

    def __init__(self, network="resnet50_deeplabv3plus", num_classes=150,
                 input_size=512, trained_model_path=""):
        self.input_size = input_size
        self.model = MODELS.create(network, num_classes=num_classes)
        x0 = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        variables = jax.jit(lambda r, x: self.model.init(
            {"params": r}, x, False))(jax.random.PRNGKey(0), x0)
        self.variables = _load_params(variables, trained_model_path)
        self._forward = jax.jit(
            lambda v, x: jnp.argmax(self.model.apply(v, x, False), -1))

    def __call__(self, image_rgb: np.ndarray):
        h, w = image_rgb.shape[:2]
        s = self.input_size
        img = cv2.resize(image_rgb.astype(np.float32), (s, s)) / 255.0
        mask = np.asarray(self._forward(self.variables, img[None]))[0]
        return cv2.resize(mask.astype(np.uint8), (w, h),
                          interpolation=cv2.INTER_NEAREST)


class SAMPredictor:
    """Parity: gradio_demo SAM apps — point-prompted
    (13.1.gradio_segment_anything_single_image.py) and circle-target
    box-prompted (13.2.gradio_segment_anything_circle_target_single_image.py:
    the drawn region's cv2.boundingRect becomes a box prompt) mask
    prediction."""

    def __init__(self, network="sam_b", image_size=1024,
                 trained_model_path="", **model_kwargs):
        self.image_size = image_size
        self.model = MODELS.create(network, image_size=image_size,
                                   **model_kwargs)
        x0 = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        prompts = {"prompt_point": jnp.full((1, 9, 3), -1.0),
                   "prompt_box": jnp.zeros((1, 4)),
                   "prompt_mask": jnp.zeros((1, image_size // 4,
                                             image_size // 4, 1))}
        variables = jax.jit(lambda r, x, pr: self.model.init(
            r, x, pr, (0, 1, 2, 3), False))(
            jax.random.PRNGKey(0), x0, prompts)
        self.variables = _load_params(variables, trained_model_path)

        def fwd(v, x, points):
            pr = {"prompt_point": points, "prompt_box": None,
                  "prompt_mask": None}
            masks, ious = self.model.apply(v, x, pr, (0, 1, 2, 3), False)
            best = jnp.argmax(ious, -1)
            return jnp.take_along_axis(
                masks, best[:, None, None, None].repeat(
                    masks.shape[2], 2).repeat(masks.shape[3], 3), 1)[:, 0]

        self._forward = jax.jit(fwd)

        def fwd_box(v, x, box):
            pr = {"prompt_point": None, "prompt_box": box,
                  "prompt_mask": None}
            masks, ious = self.model.apply(v, x, pr, (0, 1, 2, 3), False)
            best = jnp.argmax(ious, -1)
            return jnp.take_along_axis(
                masks, best[:, None, None, None].repeat(
                    masks.shape[2], 2).repeat(masks.shape[3], 3), 1)[:, 0]

        self._forward_box = jax.jit(fwd_box)

    def __call__(self, image_rgb: np.ndarray, points_xy):
        h, w = image_rgb.shape[:2]
        s = self.image_size
        factor = s / max(h, w)
        nh, nw = int(round(h * factor)), int(round(w * factor))
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = cv2.resize(image_rgb.astype(np.float32),
                                      (nw, nh)) / 255.0
        pts = np.full((1, 9, 3), -1.0, np.float32)
        for i, (x, y) in enumerate(points_xy[:9]):
            pts[0, i] = [x * factor, y * factor, 1.0]
        mask = np.asarray(self._forward(self.variables,
                                        jnp.asarray(canvas[None]),
                                        jnp.asarray(pts)))[0]
        mask = (mask > 0).astype(np.uint8)[:nh, :nw]
        return cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)

    def predict_box(self, image_rgb: np.ndarray, box_xyxy):
        """Box prompt in image coordinates (the circle-target flow:
        reference 13.2 computes cv2.boundingRect of the user's drawn
        region and prompts with that box)."""
        h, w = image_rgb.shape[:2]
        s = self.image_size
        factor = s / max(h, w)
        nh, nw = int(round(h * factor)), int(round(w * factor))
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = cv2.resize(image_rgb.astype(np.float32),
                                      (nw, nh)) / 255.0
        x1, y1, x2, y2 = [float(v) * factor for v in box_xyxy]
        box = np.asarray([[x1, y1, x2, y2]], np.float32)
        mask = np.asarray(self._forward_box(self.variables,
                                            jnp.asarray(canvas[None]),
                                            jnp.asarray(box)))[0]
        mask = (mask > 0).astype(np.uint8)[:nh, :nw]
        return cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)

    def predict_region(self, image_rgb: np.ndarray, region_mask: np.ndarray):
        """Drawn-region prompt: bounding rect of the nonzero region becomes
        the box prompt (reference 13.2:86-99)."""
        m = np.asarray(region_mask)
        if m.ndim == 3:
            m = cv2.cvtColor(m.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        m = (m > 0).astype(np.uint8)
        x, y, bw, bh = cv2.boundingRect(m)
        return self.predict_box(image_rgb, (x, y, x + bw, y + bh))


class InstanceSegmentationPredictor:
    """Parity: gradio_demo/5.gradio_instance_segment_single_image.py
    (SOLOv2 or YOLACT decode -> per-instance masks)."""

    def __init__(self, network="resnet50_solov2", decoder="SOLOV2Decoder",
                 num_classes=80, input_size=1024, trained_model_path="",
                 decoder_kwargs=None):
        self.input_size = input_size
        extra = {"num_classes": num_classes + 1} if "yolact" in network \
            else {"num_classes": num_classes}
        self.model = MODELS.create(network, **extra)
        x0 = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        variables = jax.jit(lambda r, x: self.model.init(
            {"params": r}, x, False))(jax.random.PRNGKey(0), x0)
        self.variables = _load_params(variables, trained_model_path)
        self.decoder = DECODERS.create(decoder, **(decoder_kwargs or {}))
        self._forward = jax.jit(lambda v, x: self.model.apply(v, x, False))

    def __call__(self, image_rgb: np.ndarray, score_threshold: float = 0.3):
        h, w = image_rgb.shape[:2]
        s = self.input_size
        factor = s / max(h, w)
        nh, nw = int(round(h * factor)), int(round(w * factor))
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = cv2.resize(image_rgb.astype(np.float32),
                                      (nw, nh)) / 255.0
        outs = self._forward(self.variables, jnp.asarray(canvas[None]))
        masks, labels, scores = self.decoder(outs)
        keep = scores[0] > score_threshold
        out_masks = []
        for m in masks[0][keep]:
            m8 = (np.asarray(m) > 0.5).astype(np.uint8)
            m8 = cv2.resize(m8, (s, s), interpolation=cv2.INTER_NEAREST)
            out_masks.append(cv2.resize(m8[:nh, :nw], (w, h),
                                        interpolation=cv2.INTER_NEAREST))
        return out_masks, labels[0][keep], scores[0][keep]


class BinarySegmentationPredictor:
    """Parity: gradio_demo/6.gradio_salient_object_detection_single_image.py
    (PFAN sigmoid mask; also used for matting-style fused alpha)."""

    def __init__(self, network="resnet50_pfan_segmentation", input_size=832,
                 trained_model_path="", output_head=None):
        self.input_size = input_size
        self.output_head = output_head
        self.model = MODELS.create(network)
        x0 = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        variables = jax.jit(lambda r, x: self.model.init(
            {"params": r}, x, False))(jax.random.PRNGKey(0), x0)
        self.variables = _load_params(variables, trained_model_path)

        def fwd(v, x):
            out = self.model.apply(v, x, False)
            if isinstance(out, (tuple, list)):  # matting: (g, l, fused)
                out = out[-1]
            return out

        self._forward = jax.jit(fwd)

    def __call__(self, image_rgb: np.ndarray):
        h, w = image_rgb.shape[:2]
        s = self.input_size
        img = cv2.resize(image_rgb.astype(np.float32), (s, s)) / 255.0
        pred = np.asarray(self._forward(self.variables, img[None]))[0, ..., 0]
        return cv2.resize(pred.astype(np.float32), (w, h))


class HumanMattingPredictor(BinarySegmentationPredictor):
    """Parity: gradio_demo/7.gradio_human_matting_single_image.py (fused
    alpha from the PFAN matting 3-head model)."""

    def __init__(self, network="resnet50_pfan_matting", input_size=832,
                 trained_model_path=""):
        super().__init__(network=network, input_size=input_size,
                         trained_model_path=trained_model_path)


class TextDetectionPredictor:
    """Parity: gradio_demo/8.gradio_ocr_text_detect_single_image.py
    (DBNet probability map -> host contour decode)."""

    def __init__(self, network="resnet50_dbnet", input_size=1024,
                 trained_model_path="", decoder_kwargs=None):
        from simpleaicv_tpu.data.text_detection import DBNetDecoder
        self.input_size = input_size
        self.model = MODELS.create(network)
        x0 = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        variables = jax.jit(lambda r, x: self.model.init(
            {"params": r}, x, False))(jax.random.PRNGKey(0), x0)
        self.variables = _load_params(variables, trained_model_path)
        self.decoder = DBNetDecoder(**(decoder_kwargs or {}))
        self._forward = jax.jit(lambda v, x: self.model.apply(v, x, False))

    def __call__(self, image_rgb: np.ndarray):
        h, w = image_rgb.shape[:2]
        s = self.input_size
        factor = s / max(h, w)
        nh, nw = int(round(h * factor)), int(round(w * factor))
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = cv2.resize(image_rgb.astype(np.float32),
                                      (nw, nh)) / 255.0
        probs = np.asarray(self._forward(self.variables,
                                         jnp.asarray(canvas[None])))
        boxes, scores = self.decoder(probs)[0]
        return [np.asarray(b, np.float32) / factor for b in boxes], scores


class TextRecognitionPredictor:
    """Parity: gradio_demo/9.gradio_ocr_text_recognition_single_image.py
    (CTC greedy decode on a keep-ratio 32xW canvas)."""

    def __init__(self, backbone="resnet50", encoder="BiLSTMEncoder",
                 chars=None, str_max_length=80, input_h=32, input_w=512,
                 trained_model_path=""):
        from simpleaicv_tpu.data.text_recognition import CTCTextLabelConverter
        from simpleaicv_tpu.models.text_recognition import CTCModel
        if chars is None:
            chars = [chr(c) for c in range(32, 127)]
        self.converter = CTCTextLabelConverter(chars, str_max_length)
        self.input_h, self.input_w = input_h, input_w
        self.model = CTCModel(backbone_type=backbone, encoder_type=encoder,
                              num_classes=self.converter.num_classes)
        x0 = jnp.zeros((1, input_h, input_w, 3), jnp.float32)
        variables = jax.jit(lambda r, x: self.model.init(
            {"params": r}, x, False))(jax.random.PRNGKey(0), x0)
        self.variables = _load_params(variables, trained_model_path)
        self._forward = jax.jit(
            lambda v, x: jnp.argmax(self.model.apply(v, x, False), -1))

    def __call__(self, image_rgb: np.ndarray) -> str:
        h, w = image_rgb.shape[:2]
        factor = self.input_h / h
        nw = min(int(round(w * factor)), self.input_w)
        canvas = np.zeros((self.input_h, self.input_w, 3), np.float32)
        canvas[:, :nw] = cv2.resize(image_rgb.astype(np.float32),
                                    (nw, self.input_h)) / 255.0
        idxs = np.asarray(self._forward(self.variables,
                                        jnp.asarray(canvas[None])))
        return self.converter.decode(idxs)[0]


class FaceDetectionPredictor(DetectionPredictor):
    """Parity: gradio_demo/10.gradio_face_detect_single_image.py
    (RetinaFace has a fixed single face class, so no num_classes kwarg)."""

    def __init__(self, network="resnet50_retinaface",
                 decoder="RetinaFaceDecoder", input_size=1024,
                 trained_model_path="", decoder_kwargs=None):
        self.input_size = input_size
        self.model = MODELS.create(network)
        x0 = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        variables = jax.jit(lambda r, x: self.model.init(
            {"params": r}, x, False))(jax.random.PRNGKey(0), x0)
        self.variables = _load_params(variables, trained_model_path)
        self.decoder = DECODERS.create(decoder, **(decoder_kwargs or {}))
        self._forward = jax.jit(lambda v, x: self.model.apply(v, x, False))


class ParsingPredictor(SemanticSegmentationPredictor):
    """Parity: gradio_demo/11+12 face/human parsing apps (argmax label
    map on the PFAN parsing heads)."""

    def __init__(self, network="resnet50_pfan_face_parsing", num_classes=19,
                 input_size=512, trained_model_path=""):
        super().__init__(network=network, num_classes=num_classes,
                         input_size=input_size,
                         trained_model_path=trained_model_path)
