"""Gradio ocr text recognition demo (parity: reference
gradio_demo/9.gradio_ocr_text_recognition_single_image.py). Headless predict via
demo/predictors.py when gradio is unavailable."""

from predictors import TextRecognitionPredictor

predictor = TextRecognitionPredictor()


def predict(image):
    return predictor(image)


if __name__ == "__main__":
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio is not installed in this environment; use "
                         "demo.predictors.TextRecognitionPredictor directly.")
    gr.Interface(fn=predict, inputs=gr.Image(type="numpy"),
                 outputs="json").launch()
