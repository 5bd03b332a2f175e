from .train import (  # noqa
    fit_classification,
    fit_regression,
    run_experiment,
    run_experiment_reg,
)
