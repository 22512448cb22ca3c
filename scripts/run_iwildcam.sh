#!/bin/bash
# iWildCam FLYP fine-tune (myshells, README.md:45): bs256, lr 1e-5, wd 0.2, 20 epochs.
set -e
python -m flyp_tpu.cli.main \
  --train-dataset=IWildCamIDVal --template=iwildcam_template \
  --eval-datasets=IWildCamIDVal,IWildCamID,IWildCamOOD \
  --model='ViT-B/16' --ft_data=datasets/csv/iwildcam_v2.0/train.csv \
  --data-location=datasets/data \
  --batch-size=256 --lr=1e-5 --wd=0.2 --epochs=20 \
  --exp_name=flyp_iwildcam --save=checkpoints/ "$@"
