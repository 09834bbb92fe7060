"""Gradio salient object detection demo (parity: reference
gradio_demo/6.gradio_salient_object_detection_single_image.py). Headless predict via
demo/predictors.py when gradio is unavailable."""

from predictors import BinarySegmentationPredictor

predictor = BinarySegmentationPredictor()


def predict(image):
    return predictor(image)


if __name__ == "__main__":
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio is not installed in this environment; use "
                         "demo.predictors.BinarySegmentationPredictor directly.")
    gr.Interface(fn=predict, inputs=gr.Image(type="numpy"),
                 outputs="json").launch()
