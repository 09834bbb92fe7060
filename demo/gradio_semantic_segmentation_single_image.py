"""Gradio semantic_segmentation demo (parity: reference gradio_demo semantic_segmentation app).
Headless predict via demo/predictors.py when gradio is unavailable."""

from predictors import DetectionPredictor, SemanticSegmentationPredictor, \
    SAMPredictor

if __name__ == "__main__":
    try:
        import gradio as gr  # noqa: F401
    except ImportError:
        raise SystemExit("gradio is not installed; use demo.predictors "
                         "directly.")
    predictor = SemanticSegmentationPredictor()

    def predict(image):
        return predictor(image)

    gr.Interface(fn=predict, inputs=gr.Image(type="numpy"),
                 outputs=gr.Image(type="numpy")).launch()
