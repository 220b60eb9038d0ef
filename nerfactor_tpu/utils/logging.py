"""Colored console logger (reference util/logging.py:21-87 behavior)."""

import sys
from datetime import datetime


class Logger:
    COLORS = {'info': '\033[92m', 'warn': '\033[93m', 'error': '\033[91m'}
    END = '\033[0m'

    def __init__(self, loggee=None, debug_mode=False):
        self.loggee = loggee
        self.debug_mode = debug_mode

    def _log(self, level, msg, *args):
        if args:
            msg = msg % args
        prefix = '[%s] ' % self.loggee if self.loggee else ''
        ts = datetime.now().strftime('%H:%M:%S')
        color = self.COLORS.get(level, '')
        print('%s%s %s%s%s%s' % (color, ts, prefix, level.upper() + ': ',
                                 msg, self.END), file=sys.stderr)

    def info(self, msg, *args):
        self._log('info', msg, *args)

    def warn(self, msg, *args):
        self._log('warn', msg, *args)

    warning = warn

    def error(self, msg, *args):
        self._log('error', msg, *args)

    def debug(self, msg, *args):
        if self.debug_mode:
            self._log('info', msg, *args)
