"""StepTimer port vs Common/StepTimer.h semantics (injected clock)."""

from multivolumes_tpu.utils.steptimer import (
    TICKS_PER_SECOND, StepTimer, seconds_to_ticks,
)


class FakeClock:
    def __init__(self):
        self.t = 100.0

    def __call__(self):
        return self.t


def test_variable_timestep():
    clk = FakeClock()
    t = StepTimer(now=clk)
    clk.t += 0.02
    t.tick()
    assert abs(t.elapsed_seconds - 0.02) < 1e-6
    assert t.frame_count == 1
    clk.t += 0.01
    t.tick()
    assert abs(t.total_seconds - 0.03) < 1e-6
    assert t.frame_count == 2


def test_max_delta_clamp():
    clk = FakeClock()
    t = StepTimer(now=clk)
    clk.t += 30.0  # paused in the debugger (StepTimer.h:93-96)
    t.tick()
    assert abs(t.elapsed_seconds - 1.0) < 1e-6


def test_fixed_timestep_catch_up_and_snap():
    clk = FakeClock()
    t = StepTimer(now=clk)
    t.set_fixed_time_step(True)
    t.set_target_elapsed_seconds(1 / 60)

    calls = []
    # 2.5 target intervals -> two catch-up updates, 0.5 left over
    clk.t += 2.5 / 60
    t.tick(lambda: calls.append(1))
    assert len(calls) == 2
    assert t.frame_count == 2
    assert t.elapsed_ticks == seconds_to_ticks(1 / 60)
    # remaining half interval completes on the next tick
    clk.t += 0.5 / 60
    t.tick(lambda: calls.append(1))
    assert len(calls) == 3

    # sub-1/4-ms deviation snaps to the target (StepTimer.h:110-118)
    t2 = StepTimer(now=clk)
    t2.set_fixed_time_step(True)
    t2.set_target_elapsed_seconds(1 / 60)
    clk.t += 1 / 60 + 0.0001
    t2.tick()
    assert t2.total_ticks == TICKS_PER_SECOND // 60


def test_fps_counter():
    clk = FakeClock()
    t = StepTimer(now=clk)
    for _ in range(40):
        clk.t += 1 / 30
        t.tick()
    # rolls over once the accumulated second elapses
    assert t.frames_per_second in (29, 30, 31)


def test_reset_elapsed_time():
    clk = FakeClock()
    t = StepTimer(now=clk)
    t.set_fixed_time_step(True)
    clk.t += 10.0
    t.reset_elapsed_time()
    clk.t += 1 / 60
    t.tick()
    assert t.frame_count == 1  # no catch-up burst
