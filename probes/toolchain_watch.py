"""Toolchain watch (VERDICT r4 #7): re-earn the "compiler-bound at ~19-24
Mrays/s" claim on every jax/libtpu bump.

Runs, in ONE process (tunnel is single-client):
  1. the in-loop fused row-gather characterization (gather_probe.p2_inloop)
     — recorded rates 9.0-9.2 ns/row/iter small-table, 19.6-21.5 big-table
     (2026-08-17);
  2. the Mosaic per-row-DMA kernel (pallas_min_probe t11 + the t13 K-sweep)
     — recorded ~135-137 ns/row flat in K (2026-08-18), i.e. issue-bound,
     4-12x off XLA's fused gathers.

If (1) drops toward ~2-3 ns/row big-table (a vectorized gather lowering) or
(2) drops below ~20 ns/row (a multi-row indexed-DMA primitive), the tracer's
ceiling moves by the same factor — re-profile the frame immediately
(docs/XLA_GATHER_ISSUE.md is the escalation artifact).

Run at round start:  python probes/toolchain_watch.py
Appends a dated row to PERF.md under "## Toolchain watch log" and prints it.
"""

import datetime
import io
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/probes")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")

PERF = "/root/repo/PERF.md"
HEADER = "## Toolchain watch log"


def main():
    import jaxlib

    ver = f"jax {jax.__version__} / jaxlib {jaxlib.__version__}"
    dev = str(jax.devices()[0])

    import gather_probe

    buf = io.StringIO()
    with redirect_stdout(buf):
        gather_probe.p2_inloop()
    p2 = buf.getvalue()
    print(p2, flush=True)
    rates = re.findall(r"\(\s*([0-9.]+) MB\):\s+([0-9.]+) ns/row/iter", p2)
    small = [float(r) for mb, r in rates if float(mb) <= 4.2]
    big = [float(r) for mb, r in rates if float(mb) > 16]

    import pallas_min_probe

    t11_line = "t11 FAILED"
    t13_line = "t13 FAILED"
    try:
        t11_line = str(pallas_min_probe.t11(reps=3))
    except Exception as e:  # compile regressions are a finding, not a crash
        t11_line = f"t11 raised: {type(e).__name__}: {e}"[:200]
    try:
        t13_line = str(pallas_min_probe.t13()).replace("\n", " | ")
    except Exception as e:
        t13_line = f"t13 raised: {type(e).__name__}: {e}"[:200]
    print(t11_line, flush=True)
    print(t13_line, flush=True)

    date = datetime.date.today().isoformat()
    row = (
        f"- {date} — {ver}; {dev}: in-loop row gather "
        f"small {min(small):.1f}-{max(small):.1f} / big "
        f"{min(big):.1f}-{max(big):.1f} ns/row/iter "
        f"(recorded 9.0-9.2 / 19.6-21.5); Mosaic per-row DMA: {t11_line}; "
        f"K-sweep: {t13_line}"
    )
    text = open(PERF).read()
    if HEADER not in text:
        # insert the section right after the title line
        lines = text.split("\n")
        lines.insert(1, f"\n{HEADER}\n\nDated re-checks of the two "
                        "compiler-bound primitives that set the tracer's "
                        "ceiling (see probes/toolchain_watch.py).\n")
        text = "\n".join(lines)
    text = text.replace(HEADER + "\n", HEADER + "\n" + row + "\n", 1)
    open(PERF, "w").write(text)
    print("\nAppended to PERF.md:\n" + row, flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time()-t0:.1f}s", flush=True)
