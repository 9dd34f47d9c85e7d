"""Print the ENTRY-computation ops of the compiled gru4rec step that
produce catalog-sized buffers — these are the real HBM materializations
(fusion internals don't count). Localizes the 800MB-vs-254MB traffic gap."""

from __future__ import annotations

import re
import sys

import jax

sys.path.insert(0, ".")
from bench import build  # noqa: E402


def main():
    step, state, batch = build()
    jitted = jax.jit(step.raw, donate_argnums=(0,))
    compiled = jitted.lower(state, batch, step.aux).compile()
    hlo = compiled.as_text()

    # isolate ENTRY computation
    m = re.search(r"^ENTRY [^{]*\{(.*)^\}", hlo, re.M | re.S)
    entry = m.group(1)

    big = re.compile(r"(70852|70853|71680)")
    for line in entry.splitlines():
        s = line.strip()
        if not s or "=" not in s:
            continue
        lhs, rhs = s.split(" = ", 1) if " = " in s else (None, None)
        if rhs is None:
            continue
        if big.search(rhs.split("(")[0]):
            # op kind and shape only, drop operand lists
            kind = rhs.split("(")[0]
            # count calls/fusions with their name
            extra = ""
            mm = re.search(r"(calls|to_apply)=(%?\S+)", rhs)
            if mm:
                extra = f" -> {mm.group(2)[:60]}"
            mm2 = re.search(r"custom_call_target=\"([^\"]+)\"", rhs)
            if mm2:
                extra += f" [{mm2.group(1)}]"
            print(f"{kind[:100]}{extra}")


if __name__ == "__main__":
    main()
