#!/bin/bash
# Progress-validation beam search (myshells/progress_validation.sh).
set -e
python -m flyp_tpu.cli.main \
  --train-dataset=IWildCamIDVal --template=iwildcam_template \
  --eval-datasets=IWildCamIDVal,IWildCamOOD \
  --model='ViT-B/16' --ft_data=datasets/csv/iwildcam_curriculum.csv \
  --ft_data_test=datasets/csv/iwildcam_curriculum_eval.csv \
  --data-location=datasets/data \
  --batch-size=256 --lr=1e-5 --wd=0.2 --epochs=20 \
  --progress_validation --curriculum \
  --exp_name=flyp_progress_validation --save=checkpoints/ "$@"
