import os

from squeezedet_tpu.config import Config
from squeezedet_tpu.utils.logger import Logger


def _cfg(tmp_path):
    cfg = Config(mode="train", exp_id="logtest")
    cfg.finalize_dirs(root_dir=str(tmp_path))
    cfg.save_dir = str(tmp_path / "exp")
    return cfg


def test_logger_lifecycle(tmp_path, capsys):
    logger = Logger(_cfg(tmp_path))

    config_txt = open(os.path.join(tmp_path, "exp", "config.txt")).read()
    assert "jax version" in config_txt and "batch_size" in config_txt

    logger.update({"loss": 1.5, "mAP": 0.25}, phase="train", epoch=1)
    logger.update({"loss": 1.2, "epoch_time": 0.5}, phase="val", epoch=1)
    logger.update({"loss": 0.9, "mAP": 0.50}, phase="val", epoch=2)

    log_txt = open(os.path.join(logger.log_dir, "log.txt")).read()
    assert "epoch 1" in log_txt and "train" in log_txt
    assert "epoch_time 0.50min" in log_txt

    logger.plot(["loss", "mAP"])
    assert os.path.exists(os.path.join(logger.log_dir, "loss.png"))

    logger.print_bests(["loss", "mAP"])
    out = capsys.readouterr().out
    assert "Best loss: 0.900 (epoch 2)" in out
    assert "Best mAP: 0.500 (epoch 2)" in out
