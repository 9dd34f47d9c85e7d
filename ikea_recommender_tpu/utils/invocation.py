"""Record a protocol driver's exact invocation next to its output.

The r4 dress rehearsal's ``synth`` parameters were never written down and
regenerating its dataset took a parameter search (RESULTS.md r5) — so every
driver subcommand now drops a ``command_<name>.json`` (parsed args + raw
argv) into its output directory. The caller passes the output DIRECTORY
explicitly: each subcommand knows whether its ``--out`` is a file or a dir,
so nothing is guessed from the path shape.
"""

from __future__ import annotations

import json
import os
import sys


def record_invocation(args, out_dir: str) -> None:
    """Write ``command_<args.cmd>.json`` into ``out_dir``.

    ``args`` is an argparse Namespace whose non-serializable entries (the
    ``fn`` dispatch target) are dropped.
    """
    os.makedirs(out_dir or ".", exist_ok=True)
    rec = {
        k: v
        for k, v in vars(args).items()
        if k != "fn" and not callable(v)
    }
    rec["argv"] = sys.argv
    path = os.path.join(out_dir, f"command_{args.cmd}.json")
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=2)
