"""Gradio human parsing demo (parity: reference
gradio_demo/12.gradio_human_parsing_single_image.py). Headless predict via
demo/predictors.py when gradio is unavailable."""

from predictors import ParsingPredictor

predictor = ParsingPredictor()


def predict(image):
    return predictor(image)


if __name__ == "__main__":
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio is not installed in this environment; use "
                         "demo.predictors.ParsingPredictor directly.")
    gr.Interface(fn=predict, inputs=gr.Image(type="numpy"),
                 outputs="json").launch()
