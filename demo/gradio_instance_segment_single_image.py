"""Gradio instance segment demo (parity: reference
gradio_demo/5.gradio_instance_segment_single_image.py). Headless predict via
demo/predictors.py when gradio is unavailable."""

from predictors import InstanceSegmentationPredictor

predictor = InstanceSegmentationPredictor()


def predict(image):
    return predictor(image)


if __name__ == "__main__":
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio is not installed in this environment; use "
                         "demo.predictors.InstanceSegmentationPredictor directly.")
    gr.Interface(fn=predict, inputs=gr.Image(type="numpy"),
                 outputs="json").launch()
