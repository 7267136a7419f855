"""Replacement-metric flow (reference ``replacement_metric_flow.py``): a
dataset-realism measure — train model-one (an autoencoder) on datamodule A,
predict with it, train model-two on those predictions, then cross-evaluate
model-two on the original data. The closer the cross-evaluation is to
training on the original data directly, the more 'replaceable' the dataset."""
import json
import sys
from typing import Dict, List

from .modeling import main as modeling_main


def main(args: List[str]) -> Dict[str, Dict]:
    results: Dict[str, Dict] = {}

    # 1. train model-one (autoencoder) on the source datamodule
    one = modeling_main(list(args) + [
        "--flow=autoencoder", "--mode=train", "--renderers", "none",
        "--run_name=replacement-model-one"])
    results["model_one"] = one.get("val_metrics", {})

    # 2. predict with model-one over all sets and save as a dataset
    pred = modeling_main(list(args) + [
        "--flow=autoencoder", "--mode=predict",
        "--predict_sets", "train", "val", "test",
        "--renderers", "none", "--run_name=replacement-predict"])
    dm = pred["dm"]
    subsets_dir = None
    for set_name, outputs in pred["predictions"].items():
        if hasattr(dm, "save_predictions"):
            subsets_dir = dm.save_predictions(set_name, outputs,
                                              run_id="replacement")

    # 3. train model-two on the predictions
    if subsets_dir is not None:
        two = modeling_main(list(args) + [
            "--flow=autoencoder", "--mode=train",
            f"--subsets_dir={subsets_dir}", "--renderers", "none",
            "--run_name=replacement-model-two"])
        results["model_two_on_predictions"] = two.get("val_metrics", {})

    # 4. cross-evaluate: model trained on predictions, tested on originals
    cross = modeling_main(list(args) + [
        "--flow=autoencoder", "--mode=test", "--renderers", "none",
        "--run_name=replacement-cross-eval"])
    results["cross_eval"] = cross.get("test_metrics", {})

    print(json.dumps({k: {m: v for m, v in d.items()
                          if isinstance(v, (int, float))}
                      for k, d in results.items()}, indent=1))
    return results


def run():
    main(sys.argv[1:])


if __name__ == "__main__":
    run()
