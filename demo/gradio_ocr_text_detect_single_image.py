"""Gradio ocr text detect demo (parity: reference
gradio_demo/8.gradio_ocr_text_detect_single_image.py). Headless predict via
demo/predictors.py when gradio is unavailable."""

from predictors import TextDetectionPredictor

predictor = TextDetectionPredictor()


def predict(image):
    return predictor(image)


if __name__ == "__main__":
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio is not installed in this environment; use "
                         "demo.predictors.TextDetectionPredictor directly.")
    gr.Interface(fn=predict, inputs=gr.Image(type="numpy"),
                 outputs="json").launch()
