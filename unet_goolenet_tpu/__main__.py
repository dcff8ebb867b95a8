"""`python -m unet_goolenet_tpu <command>` — one dispatcher over the CLI apps.

The reference ships four bare scripts run from two different working
directories (分割/main.py, 分割/predict.py, 分类/ROI_main.py, 分类/test.py);
here every workflow hangs off the installed package (also exposed as the
`ugt` console script, pyproject.toml). Commands lazy-import their app module
so `--help` stays instant and JAX backend bring-up only happens for the
command that runs.
"""

from __future__ import annotations

import importlib
import sys

COMMANDS = {
    "train-seg": ("unet_goolenet_tpu.apps.train_seg",
                  "stage-1 UNet segmentation training (分割/main.py)"),
    "predict-seg": ("unet_goolenet_tpu.apps.predict_seg",
                    "stage-1 batch mask prediction (分割/predict.py)"),
    "train-cls": ("unet_goolenet_tpu.apps.train_cls",
                  "stage-2 GoogLeNet grading training (分类/ROI_main.py)"),
    "infer-e2e": ("unet_goolenet_tpu.apps.infer_e2e",
                  "two-stage end-to-end grading (分类/test.py)"),
    "serve": ("unet_goolenet_tpu.apps.serve",
              "production HTTP serving host (micro-batching)"),
    "export": ("unet_goolenet_tpu.apps.export_serving",
               "export the serving graph as a StableHLO artifact"),
}


def _usage() -> str:
    width = max(len(name) for name in COMMANDS)
    lines = [f"  {name:<{width}}  {desc}" for name, (_, desc) in COMMANDS.items()]
    return (
        "usage: python -m unet_goolenet_tpu <command> [args...]\n\n"
        "commands:\n" + "\n".join(lines) +
        "\n\nRun `python -m unet_goolenet_tpu <command> --help` for command args."
    )


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else list(argv)
    if argv and argv[0] in ("-h", "--help"):
        print(_usage())
        raise SystemExit(0)
    if not argv:  # error path: usage on stderr like the unknown-command case
        print(_usage(), file=sys.stderr)
        raise SystemExit(2)
    cmd, rest = argv[0], argv[1:]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd}\n\n{_usage()}", file=sys.stderr)
        raise SystemExit(2)
    module, _ = COMMANDS[cmd]
    importlib.import_module(module).main(rest)


if __name__ == "__main__":
    main()
