"""Run several example scripts inside ONE interpreter, report per-script.

The smoke gate used to spawn one subprocess per example; on the 1-core CI
host each pays ~4 s of interpreter+jax+atomai_tpu import before doing any
work (~30 s across the sweep). Running the single-device examples
sequentially in one process keeps the end-to-end coverage (each script
still executes top-to-bottom as ``__main__`` via runpy) while paying the
import once. `multichip_training.py` stays in its own process — it must
set XLA_FLAGS before jax initializes.

Prints one line per finished example (``AOI_EXAMPLE <json>``) so the
parent can attribute failures even if a later script hard-crashes the
process.
"""

import io
import json
import os
import runpy
import sys
import traceback
from contextlib import redirect_stderr, redirect_stdout


def main():
    examples_dir = sys.argv[1]
    names = sys.argv[2:]
    n_fail = 0
    for name in names:
        buf = io.StringIO()
        ok, err = True, ""
        # scripts share one interpreter: restore the env/cwd a script
        # mutates so a later script's pass/fail reproduces standalone
        env_snapshot = dict(os.environ)
        cwd_snapshot = os.getcwd()
        try:
            with redirect_stdout(buf), redirect_stderr(buf):
                runpy.run_path(os.path.join(examples_dir, name),
                               run_name="__main__")
        except SystemExit as e:  # explicit sys.exit(0) counts as success
            ok = e.code in (0, None)
            err = "" if ok else f"SystemExit({e.code})"
        except (KeyboardInterrupt, MemoryError):
            raise  # never swallow interrupts / OOM and keep running
        except Exception:
            ok = False
            err = traceback.format_exc()[-2000:]
        finally:
            os.environ.clear()
            os.environ.update(env_snapshot)
            os.chdir(cwd_snapshot)
        n_fail += not ok
        out = buf.getvalue()
        rec = {"name": name, "ok": ok,
               "tail": out[-300:] if ok else out[-1500:], "err": err}
        print("AOI_EXAMPLE " + json.dumps(rec), flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
