"""Launcher grid generation / command formatting (modeled on reference
tests/test_launcher.py)."""

from sample_factory_tpu.launcher.run_description import Experiment, ParamGrid, ParamList, RunDescription


def test_param_grid():
    grid = ParamGrid([("a", [1, 2]), ("b", ["x", "y"])])
    combos = list(grid.generate_params(randomize=False))
    assert combos == [
        {"a": 1, "b": "x"},
        {"a": 1, "b": "y"},
        {"a": 2, "b": "x"},
        {"a": 2, "b": "y"},
    ]


def test_param_grid_coupled_params():
    grid = ParamGrid([(("lr", "bs"), [(1e-3, 32), (1e-4, 64)])])
    combos = list(grid.generate_params(randomize=False))
    assert combos == [{"lr": 1e-3, "bs": 32}, {"lr": 1e-4, "bs": 64}]


def test_param_list():
    pl = ParamList([{"seed": 0}, {"seed": 1}])
    assert list(pl.generate_params(randomize=False)) == [{"seed": 0}, {"seed": 1}]


def test_run_description_generates_commands(tmp_path):
    grid = ParamGrid([("seed", [0, 1]), ("learning_rate", [1e-3])])
    exp = Experiment("test_exp", "python -m sf_examples_tpu.train_synthetic --env=synthetic_vector_discrete", grid.generate_params(randomize=False))
    rd = RunDescription("my_run", [exp])
    cmds = list(rd.generate_experiments(str(tmp_path)))
    assert len(cmds) == 2
    cmd, name, root_dir, env_vars = cmds[0]
    assert "--seed=0" in cmd and "--learning_rate=0.001" in cmd
    assert "--experiment=test_exp_seed_0_learning_rate_0.001" in cmd
    assert f"--train_dir={tmp_path}/my_run/test_exp" in cmd
    assert (tmp_path / "my_run" / "test_exp").is_dir()


def test_list_param_formatting(tmp_path):
    grid = ParamGrid([("encoder_mlp_layers", [[64, 64], [128]])])
    exp = Experiment("e", "train", grid.generate_params(randomize=False))
    rd = RunDescription("r", [exp], customize_experiment_name=False)
    cmds = [c for c, *_ in rd.generate_experiments(str(tmp_path), makedirs=False)]
    assert "--encoder_mlp_layers=64 64" in cmds[0]
    assert "--encoder_mlp_layers=128" in cmds[1]
