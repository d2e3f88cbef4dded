"""Preemption-safe shutdown for long training runs.

The reference has no failure handling at all (SURVEY.md §5.3 — recovery
is manual resume). TPU pods are routinely preempted with a SIGTERM grace
window; this helper turns that signal into a cooperative stop flag so
the train loop can finish its in-flight step, write a checkpoint, and
exit cleanly — the next invocation's ``--resume`` then continues from
that step instead of losing the epoch.

Usage:
    with GracefulShutdown() as stop:
        for batch in loader:
            step(...)
            if stop.requested:
                save_checkpoint(...)
                break
"""

from __future__ import annotations

import signal


class GracefulShutdown:
    """Context manager latching SIGTERM/SIGINT into ``requested``.

    The first signal sets the flag (and prints the reason); a second
    SIGINT re-raises KeyboardInterrupt so an impatient Ctrl-C Ctrl-C
    still kills the process. Previous handlers are restored on exit.
    Signal handlers can only be installed from the main thread; in other
    threads this degrades to an inert flag (``requested`` stays False).
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = signals
        self._previous: dict = {}
        self.requested = False

    def _handler(self, signum, frame):
        if self.requested and signum == signal.SIGINT:
            raise KeyboardInterrupt
        self.requested = True
        print(f'[preemption] received {signal.Signals(signum).name}; '
              'finishing the current step and checkpointing '
              '(signal again to force-quit)')

    def __enter__(self):
        try:
            for s in self._signals:
                self._previous[s] = signal.signal(s, self._handler)
        except ValueError:   # not the main thread
            self._previous = {}
        return self

    def __exit__(self, *exc):
        for s, prev in self._previous.items():
            signal.signal(s, prev)
        return False
