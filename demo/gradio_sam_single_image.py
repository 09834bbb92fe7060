"""Gradio sam demo (parity: reference gradio_demo sam app).
Headless predict via demo/predictors.py when gradio is unavailable."""

from predictors import DetectionPredictor, SemanticSegmentationPredictor, \
    SAMPredictor

if __name__ == "__main__":
    try:
        import gradio as gr  # noqa: F401
    except ImportError:
        raise SystemExit("gradio is not installed; use demo.predictors "
                         "directly.")
    predictor = SAMPredictor()

    def predict(image, x, y):
        return predictor(image, [(x, y)]) * 255

    gr.Interface(fn=predict,
                 inputs=[gr.Image(type="numpy"), gr.Number(), gr.Number()],
                 outputs=gr.Image(type="numpy")).launch()
