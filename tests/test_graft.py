"""Driver-hook contract tests: __graft_entry__.entry compiles and runs;
dryrun_multichip executes the full sharded step on the virtual mesh."""

import sys
import pathlib

import jax
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        frames, metrics, valid, n = out
        assert frames.shape[-1] == 134

    def test_dryrun_multichip_8(self, capsys):
        import __graft_entry__ as g
        g.dryrun_multichip(8)
        assert "OK" in capsys.readouterr().out

    def test_dryrun_multichip_2(self, capsys):
        import __graft_entry__ as g
        g.dryrun_multichip(2)
        assert "OK" in capsys.readouterr().out
