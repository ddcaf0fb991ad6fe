"""Entry points mirroring the reference scripts (BASELINE.json):

- extract_distribution  <- RegressionNetwork/representation/distribution_representation.py
- train_regression      <- RegressionNetwork/train.py (+ run.sh)
- test_regression       <- RegressionNetwork/test.py
- train_projector       <- GenProjector/train.py (+ train_laval.sh)
- test_projector        <- GenProjector/test.py (+ test.sh)
- needlets_gt           <- Needlets/gt_gen_j2.py, gt_gen_j3.py, mat_gen2.py
- preview               <- RegressionNetwork/representation/exr_reader.py
"""
