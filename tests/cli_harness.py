"""In-process CLI tool harness.

The reference exercises its 21 executables via subprocess
(`test/test_utils.py`); a faithful port of that strategy costs a full
interpreter + jax import per spawned tool (~4 s each on this box),
which makes the CLI suites the slowest part of the whole test run.
`run_tool` here invokes the same `main(argv)` entry points in-process
with captured stdout/stderr and returns a subprocess.CompletedProcess
look-alike, so the black-box assertions (exit codes, output text,
files written) are unchanged while the jax import is paid once per
session.  A couple of true-subprocess smoke tests remain in
test_cli.py to cover the `tools/` shim scripts themselves.
"""

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tool script name -> cli module name
_MODULE_FOR = {"audiotools-config": "config_tool"}


class ToolResult:
    """subprocess.CompletedProcess look-alike for in-process runs"""

    def __init__(self, args, returncode, stdout, stderr):
        self.args = args
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr

    def __repr__(self):
        return ("ToolResult(args=%r, returncode=%r)\n"
                "--- stdout ---\n%s\n--- stderr ---\n%s" %
                (self.args, self.returncode, self.stdout, self.stderr))


def run_tool(name, *args, timeout=None, env=None):
    """runs tools/<name> in-process; returns ToolResult

    env, if given, is a dict of extra environment variables applied
    for the duration of the call (os.environ is restored after)."""
    import importlib

    module_name = _MODULE_FOR.get(name, name)
    module = importlib.import_module("audiotools_tpu.cli." + module_name)

    stdout = io.StringIO()
    stderr = io.StringIO()
    saved_env = {}
    if env:
        for (key, value) in env.items():
            saved_env[key] = os.environ.get(key)
            os.environ[key] = value
    try:
        with contextlib.redirect_stdout(stdout), \
                contextlib.redirect_stderr(stderr):
            try:
                code = module.main(list(args))
            except SystemExit as exit_err:
                code = exit_err.code
        if code is None:
            code = 0
        elif not isinstance(code, int):
            print(str(code), file=stderr)
            code = 1
    finally:
        for (key, value) in saved_env.items():
            if value is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = value
    return ToolResult([name] + list(args), code,
                      stdout.getvalue(), stderr.getvalue())


def run_tool_subprocess(name, *args, timeout=300, env_extra=None):
    """true black-box spawn of tools/<name> (slow: fresh interpreter)"""
    import subprocess

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", name)] + list(args),
        capture_output=True, text=True, env=env, timeout=timeout)
