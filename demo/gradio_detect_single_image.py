"""Gradio detect demo (parity: reference gradio_demo detect app).
Headless predict via demo/predictors.py when gradio is unavailable."""

from predictors import DetectionPredictor, SemanticSegmentationPredictor, \
    SAMPredictor

if __name__ == "__main__":
    try:
        import gradio as gr  # noqa: F401
    except ImportError:
        raise SystemExit("gradio is not installed; use demo.predictors "
                         "directly.")
    predictor = DetectionPredictor()

    def predict(image):
        boxes, classes, scores = predictor(image)
        return predictor.draw(image, boxes, classes, scores)

    gr.Interface(fn=predict, inputs=gr.Image(type="numpy"),
                 outputs=gr.Image(type="numpy")).launch()
