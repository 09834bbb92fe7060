"""Gradio human matting demo (parity: reference
gradio_demo/7.gradio_human_matting_single_image.py). Headless predict via
demo/predictors.py when gradio is unavailable."""

from predictors import HumanMattingPredictor

predictor = HumanMattingPredictor()


def predict(image):
    return predictor(image)


if __name__ == "__main__":
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio is not installed in this environment; use "
                         "demo.predictors.HumanMattingPredictor directly.")
    gr.Interface(fn=predict, inputs=gr.Image(type="numpy"),
                 outputs="json").launch()
