"""Gradio classification demo (parity: reference
gradio_demo/1.gradio_classify_single_image.py). Headless predict via
demo/predictors.py when gradio is unavailable."""

from predictors import ClassificationPredictor

predictor = ClassificationPredictor()


def predict(image):
    return {str(i): p for i, p in predictor(image)}


if __name__ == "__main__":
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio is not installed in this environment; use "
                         "demo.predictors.ClassificationPredictor directly.")
    gr.Interface(fn=predict, inputs=gr.Image(type="numpy"),
                 outputs=gr.Label(num_top_classes=5)).launch()
