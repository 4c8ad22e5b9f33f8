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


def test_ngc_backend_templating(tmp_path, capsys):
    """NGC backend renders {{ name }}/{{ experiment_cmd }} into the job template
    (reference launcher/run_ngc.py behavior), print-only mode."""
    import argparse

    from sample_factory_tpu.launcher.run_ngc import render_job_command, run_ngc

    template = tmp_path / "job.template"
    template.write_text(
        "ngc batch run --name {{ name }} \\\n  --image foo:latest \\\n  --commandline \"{{ experiment_cmd }}\"\n"
    )
    rendered = render_job_command(template.read_text(), "jobname", "python train.py --x=1")
    assert rendered == 'ngc batch run --name jobname --image foo:latest --commandline "python train.py --x=1"'

    grid = ParamGrid([("seed", [0, 1])])
    exp = Experiment("ngc_exp", "python -m train", grid.generate_params(randomize=False))
    rd = RunDescription("ngc_run", [exp])
    args = argparse.Namespace(
        train_dir=str(tmp_path), ngc_job_template=str(template), ngc_print_only=True, pause_between=0
    )
    assert run_ngc(rd, args) == 0

    # missing template -> error
    args.ngc_job_template = None
    assert run_ngc(rd, args) == 1
