#!/usr/bin/env python
"""Config-driven pipeline runner.

``python bin/gwinferno_run_from_config.py config.yml [--inspect]``

The reference CLI (bin/gwinferno_run_from_config.py) imports two functions
that do not exist in its own library (SURVEY.md S7.3 item 1); this runner
implements the intended flow.  Logic lives in gwinferno_tpu.pipeline.cli.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from gwinferno_tpu.pipeline.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
