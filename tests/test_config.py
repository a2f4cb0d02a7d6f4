"""Config system: yaml-over-cli priority, nested attribute access,
unknown-key tolerance (reference: pipeline/parameters.py:18-34)."""

import yaml

from deeppointmap_tpu.config import Config, load_config


def test_yaml_overrides_cli(tmp_path):
    cfg = {"name": "FromYaml", "slam_system": {"coor_scale": 42},
           "unknown_key": 7}
    path = tmp_path / "c.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    args = load_config(["--name", "FromCli", "--yaml_file", str(path)])
    assert args.name == "FromYaml"          # yaml wins
    assert args.slam_system.coor_scale == 42  # nested attr access
    assert args.unknown_key == 7            # unknown keys still set
    assert args.tpu.encoder_points > 0      # tpu defaults attached


def test_config_wraps_nested():
    c = Config(a=dict(b=dict(c=1)), lst=[dict(d=2)])
    assert c.a.b.c == 1
    assert c.lst[0].d == 2
    c.a.b.c = 5
    assert c["a"]["b"]["c"] == 5


def test_prefetch_preserves_order():
    from deeppointmap_tpu.pipeline.infer import prefetch

    class SlowDataset:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            import time
            time.sleep(0.01 * ((i * 7) % 3))  # uneven latency
            return i

    out = list(prefetch(SlowDataset(), n_buffer=6, n_workers=4))
    assert out == list(range(20))


def test_recorder_reductions():
    from deeppointmap_tpu.pipeline.train_utils import Recorder

    r = Recorder()
    r.add_dict({"loss": 2.0})
    r.add_dict({"loss": 4.0})
    r.add_item("acc", 0.5)
    assert r.mean("loss") == 3.0
    assert r.min("loss") == 2.0
    assert r.max("loss") == 4.0
    assert r.summary() == {"loss": 3.0, "acc": 0.5}
    r.clear()
    assert not list(r.keys())
