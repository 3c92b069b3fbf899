"""Every launch script's flag list must parse against the trainer CLI.

The scripts mirror the reference's (scripts/ <-> reference src/*.sh);
a flag rename or a new validation that rejects a shipped recipe would
otherwise only surface when a user runs the script.  (Found live: the
--cosmos caption-views check rejected the eval-only inference scripts,
which legitimately use the default 'raw' sampling mode.)
"""

import glob
import os
import re
import shlex

import pytest

from cosmos_tpu.training.params import parse_args

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(REPO, "scripts", "*.sh")))


def _main_args(path):
    text = open(path).read()
    if "training.seg_eval" in text:
        return None                      # separate CLI, separate parser
    m = re.search(r"cosmos_tpu\.training\.main\s*\\\n(.*)", text, re.S)
    if m is None:
        return None
    raw = re.sub(r"#.*", "", m.group(1).replace("\\\n", " "))
    return [a for a in shlex.split(raw) if a != "$@"]


@pytest.mark.parametrize("script", SCRIPTS,
                         ids=[os.path.basename(s) for s in SCRIPTS])
def test_script_flags_parse(script):
    args = _main_args(script)
    if args is None:
        pytest.skip("not a training.main invocation")
    ns = parse_args(args)
    assert ns.model


def test_cosmos_caption_check_still_guards_training():
    """The eval-only exemption must NOT weaken the training-time guard."""
    with pytest.raises(SystemExit):
        parse_args(["--cosmos", "--output-all", "--attentional-pool",
                    "--add-zero-attn", "--train-data", "x-{0..1}.tar",
                    "--caption-sampling-mode", "raw"])
    # eval-only (no train data, or --eval-mode): raw mode is fine
    ns = parse_args(["--cosmos", "--output-all", "--attentional-pool",
                     "--add-zero-attn", "--eval-mode", "retrieval"])
    assert ns.cosmos
