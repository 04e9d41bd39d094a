"""TensorBoard metrics sink (ref criterion.logging -> tensorboardX)."""

import os


def test_tb_callback_writes_event_files(tmp_path):
    from coalign_tpu.utils.tb_logging import make_tb_callback

    seen = []
    cb, close = make_tb_callback(str(tmp_path / "tb"),
                                 inner=seen.append)
    cb({"step": 1, "epoch": 0, "total_loss": 1.5, "cls_loss": 0.7})
    cb({"step": 2, "epoch": 0, "val_loss": 1.2})
    close()
    assert len(seen) == 2
    files = []
    for root, _, names in os.walk(str(tmp_path / "tb")):
        files += [os.path.join(root, n) for n in names]
    assert any("tfevents" in f for f in files)
    assert sum(os.path.getsize(f) for f in files) > 0
