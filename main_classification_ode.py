#!/usr/bin/env python
"""Entry point preserving the reference CLI surface:
    python main_classification_ode.py -c <config> -cp <config_dir>
Implementation: odevit_tpu/cli/classification_ode.py
"""
from odevit_tpu.cli import common
from odevit_tpu.cli.classification_ode import main

if __name__ == "__main__":
    main(common.load_config(common.parse_args()))
