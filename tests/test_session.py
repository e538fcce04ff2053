"""Session factory safety: the shared scratch sweeper must never delete a
live Spark job's spark.local.dir (shuffle data loss)."""

import os

from gjspark import session


class TestScratchSweep:
    def test_dead_pid_dir_is_reaped(self, tmp_path):
        dead = tmp_path / "sess-999999999-abc"
        dead.mkdir()
        (dead / "blockmgr" ).mkdir()
        session._sweep_stale_scratch(str(tmp_path))
        assert not dead.exists()

    def test_live_pid_dir_survives_regardless_of_age(self, tmp_path):
        live = tmp_path / f"sess-{os.getpid()}-abc"
        live.mkdir()
        # backdate mtime far past any age threshold — liveness, not age,
        # decides (dir mtime does not track changes deeper inside)
        os.utime(live, (0, 0))
        session._sweep_stale_scratch(str(tmp_path))
        assert live.exists()

    def test_non_session_dirs_untouched(self, tmp_path):
        other = tmp_path / "somebody-elses-dir"
        other.mkdir()
        os.utime(other, (0, 0))
        session._sweep_stale_scratch(str(tmp_path))
        assert other.exists()

    def test_malformed_names_skipped(self, tmp_path):
        weird = tmp_path / "sess-notapid-x"
        weird.mkdir()
        session._sweep_stale_scratch(str(tmp_path))
        assert weird.exists()

    def test_session_scratch_dir_unique_and_pid_tagged(self, tmp_path):
        a = session._session_scratch_dir(str(tmp_path))
        b = session._session_scratch_dir(str(tmp_path))
        assert a != b
        for p in (a, b):
            assert os.path.isdir(p)
            assert os.path.basename(p).startswith(f"sess-{os.getpid()}-")
