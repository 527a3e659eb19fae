"""Smoke tests for eval/analysis/scaling CLIs (CPU)."""

import json

import numpy as np


def test_eval_net_cli(tmp_path, capsys):
    from admmnet_tpu.cli.generate_dataset import main as gen_main
    from admmnet_tpu.cli.train_cli import main as train_main
    from admmnet_tpu.cli.eval_net import main as eval_main

    ds = tmp_path / "ds"
    gen_main(["--out", str(ds), "--total", "48", "--with-phi", "--phi-iters",
              "5", "--fixed-snr", "20"])
    run = tmp_path / "run"
    train_main(["--data", str(ds), "--workdir", str(run), "--phi",
                "--num-layers", "2", "--epochs", "1", "--batch-size", "16"])
    capsys.readouterr()
    eval_main(["--data", str(ds), "--ckpt", str(run), "--num-layers", "2",
               "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "phi_alignment_loss" in out
    assert out["classical_detection"]["f1"] >= 0.0


def test_analyze_times_cli(tmp_path, capsys):
    from admmnet_tpu.cli.analyze_times import main

    f1 = tmp_path / "a.txt"
    f2 = tmp_path / "b.txt"
    np.savetxt(f1, np.full(10, 0.5))
    np.savetxt(f2, np.full(10, 0.1))
    main([str(f1), str(f2), "--labels", "ADMM", "Net",
          "--plot", str(tmp_path / "fig")])
    out = capsys.readouterr().out
    assert "speedup ADMM / Net: 5.00x" in out
    assert (tmp_path / "fig" / "time_cdf.png").exists()


def test_bench_scaling_cli(capsys):
    from admmnet_tpu.cli.bench_scaling import main

    main(["--devices", "1", "2", "--batch-per-device", "4", "--iters", "2",
          "--json"])
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows[0]["devices"] == 1 and rows[1]["devices"] == 2
    assert rows[0]["efficiency"] == 1.0


def test_peaks_from_mat_cli(tmp_path, capsys):
    import scipy.io as sio

    from admmnet_tpu.cli.peaks_from_mat import main
    from admmnet_tpu.ops.atoms import atom

    phi = np.asarray(atom(0.33, -0.21, 10, 10)).reshape(-1, 1)
    f = tmp_path / "phi_ad.mat"
    sio.savemat(f, {"phi_ad": phi})
    main([str(f)])
    out = capsys.readouterr().out
    assert "[0.33" in out and "-0.21" in out


def test_eval_net_cli_e2e_mode(tmp_path, capsys):
    """--e2e: score an ADMMNet checkpoint's direct predictions with
    position-matched F1 (no phi labels needed)."""
    from admmnet_tpu.cli.generate_dataset import main as gen_main
    from admmnet_tpu.cli.train_cli import main as train_main
    from admmnet_tpu.cli.eval_net import main as eval_main

    ds = tmp_path / "ds"
    gen_main(["--out", str(ds), "--total", "48", "--fixed-snr", "20"])
    run = tmp_path / "run"
    train_main(["--data", str(ds), "--workdir", str(run),
                "--num-layers", "2", "--epochs", "1", "--batch-size", "16",
                "--assignment", "perm"])
    capsys.readouterr()
    eval_main(["--data", str(ds), "--ckpt", str(run), "--num-layers", "2",
               "--e2e", "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "e2e"
    d = out["detection"]
    assert 0.0 <= d["f1"] <= 1.0
    assert d["precision"] >= 0.0 and d["recall"] >= 0.0
