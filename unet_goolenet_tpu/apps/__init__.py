"""CLI entry points mirroring the reference's four scripts (SURVEY.md §1):

  train_seg   <- 分割/main.py      (UNet training)
  predict_seg <- 分割/predict.py   (mask PNGs + results workbook)
  train_cls   <- 分类/ROI_main.py  (GoogLeNet training over on-device ROI crops)
  infer_e2e   <- 分类/test.py      (two-stage inference -> result.txt)

All are `python -m unet_goolenet_tpu.apps.<name>`; argparse runs inside main() —
no import-time side effects (unlike the reference's config.py:71).
"""
