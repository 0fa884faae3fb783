"""Terminal output: Messenger, tables and progress displays.

Rebuild of the reference output layer
(``/root/reference/audiotools/__init__.py:317-1264``): Messenger with
output/info/error/warning channels and tty-aware ANSI handling,
output_table column alignment, ProgressDisplay/SingleProgressDisplay
progress rows updated in place.
"""

from __future__ import annotations

import os
import sys


class Messenger:
    """a class for displaying formatted output to the user"""

    def __init__(self, executable="audiotools", options=None):
        self.executable = executable
        verbosity = getattr(options, "verbosity", None) if options \
            else None
        self.__verbosity__ = verbosity or "normal"

    def quiet(self):
        return self.__verbosity__ in ("quiet", "silent")

    def output(self, s):
        """displays an output message to stdout"""
        if self.__verbosity__ != "silent":
            sys.stdout.write("%s%s" % (s, os.linesep))
            sys.stdout.flush()

    def partial_output(self, s):
        """displays a partial output message (no newline)"""
        if self.__verbosity__ != "silent":
            sys.stdout.write(str(s))
            sys.stdout.flush()

    def info(self, s):
        """displays an informative message to stderr"""
        if not self.quiet():
            sys.stderr.write("%s%s" % (s, os.linesep))

    def partial_info(self, s):
        if not self.quiet():
            sys.stderr.write(str(s))
            sys.stderr.flush()

    def warning(self, s):
        """displays a warning message to stderr"""
        if self.__verbosity__ != "silent":
            sys.stderr.write("*** Warning: %s%s" % (s, os.linesep))

    def error(self, s):
        """displays an error message to stderr"""
        sys.stderr.write("*** Error: %s%s" % (s, os.linesep))

    def os_error(self, oserror):
        """displays an OSError as a formatted error message"""
        self.error("[Errno %d] %s: '%s'" %
                   (oserror.errno, oserror.strerror,
                    getattr(oserror, "filename", "")))

    def usage(self, s):
        """displays a usage message to stderr"""
        sys.stderr.write("*** Usage: %s %s%s" %
                         (self.executable, s, os.linesep))

    def ansi_clearline(self):
        if sys.stdout.isatty():
            sys.stdout.write("\r\x1b[0K")
            sys.stdout.flush()

    def ansi_uplines(self, lines):
        if sys.stdout.isatty():
            sys.stdout.write("\x1b[%dA" % (lines,))

    def ansi_cleardown(self):
        if sys.stdout.isatty():
            sys.stdout.write("\x1b[0J")

    def terminal_size(self, fd=None):
        """returns the current terminal size as (height, width)"""
        try:
            size = os.get_terminal_size(
                fd if fd is not None else sys.stdout.fileno())
            return (size.lines, size.columns)
        except (OSError, ValueError):
            return (25, 80)


class SilentMessenger(Messenger):
    def __init__(self, executable="audiotools"):
        Messenger.__init__(self, executable)
        self.__verbosity__ = "silent"


class output_table:
    """a table of aligned columns for terminal output"""

    def __init__(self):
        self.__rows__ = []

    def row(self):
        """adds a row to the table and returns it"""
        row = output_table_row()
        self.__rows__.append(row)
        return row

    def blank_row(self):
        row = output_table_blank()
        self.__rows__.append(row)
        return row

    def divider_row(self, dividers=None):
        row = output_table_divider()
        self.__rows__.append(row)
        return row

    def format(self, is_tty=False):
        """yields one formatted string per row"""
        real_rows = [r for r in self.__rows__
                     if isinstance(r, output_table_row)]
        if real_rows:
            columns = max(len(r.__columns__) for r in real_rows)
            widths = [0] * columns
            for row in real_rows:
                for (i, (text, _align)) in enumerate(row.__columns__):
                    widths[i] = max(widths[i], len(text))
        else:
            widths = []

        for row in self.__rows__:
            yield row.format_row(widths)


class output_table_row:
    def __init__(self):
        self.__columns__ = []

    def add_column(self, text, alignment="left"):
        self.__columns__.append((str(text), alignment))

    def format_row(self, widths):
        out = []
        for ((text, alignment), width) in zip(self.__columns__, widths):
            if alignment == "right":
                out.append(text.rjust(width))
            elif alignment == "center":
                out.append(text.center(width))
            else:
                out.append(text.ljust(width))
        return "".join(out).rstrip()


class output_table_blank:
    def format_row(self, widths):
        return ""


class output_table_divider:
    def format_row(self, widths):
        return "-" * sum(widths)


class ProgressDisplay:
    """a class for displaying incremental progress updates"""

    def __init__(self, messenger):
        self.messenger = messenger
        self.progress_rows = []
        self.empty_slots = []
        self.displayed_rows = 0
        self.is_tty = sys.stdout.isatty()

    def add_row(self, output_line):
        """returns a ProgressRow for updating progress"""
        if self.empty_slots:
            row_index = self.empty_slots.pop(0)
            row = ProgressRow(self, row_index, output_line)
            self.progress_rows[row_index] = row
        else:
            row_index = len(self.progress_rows)
            row = ProgressRow(self, row_index, output_line)
            self.progress_rows.append(row)
        return row

    def remove_row(self, row_index):
        self.empty_slots.append(row_index)
        self.progress_rows[row_index] = None

    def display_rows(self):
        """outputs the current state of all progress rows"""
        if not self.is_tty:
            return
        self.clear_rows()
        for row in self.progress_rows:
            if row is not None:
                sys.stdout.write(row.unicode() + os.linesep)
                self.displayed_rows += 1
        sys.stdout.flush()

    def clear_rows(self):
        if self.is_tty and self.displayed_rows:
            self.messenger.ansi_uplines(self.displayed_rows)
            self.messenger.ansi_cleardown()
            self.displayed_rows = 0

    def output_line(self, line):
        """outputs a line above the progress rows"""
        self.clear_rows()
        self.messenger.output(line)
        self.display_rows()


class ProgressRow:
    """a single row of progress output"""

    def __init__(self, display, row_index, output_line):
        self.display = display
        self.row_index = row_index
        self.output_line = output_line
        self.current = 0
        self.total = 1

    def update(self, current, total):
        self.current = current
        self.total = max(total, 1)
        self.display.display_rows()

    def finish(self):
        self.display.remove_row(self.row_index)
        self.display.display_rows()

    def unicode(self):
        (height, width) = self.display.messenger.terminal_size()
        percent = min(100, (self.current * 100) // self.total)
        label = "%3d%% %s" % (percent, self.output_line)
        return label[:width - 1]


class SingleProgressDisplay(ProgressDisplay):
    """a ProgressDisplay for a single row of output"""

    def __init__(self, messenger, progress_text):
        ProgressDisplay.__init__(self, messenger)
        self.row = self.add_row(progress_text)
        from time import time
        self.time = time
        self.last_updated = 0.0

    def update(self, current, total):
        now = self.time()
        if (now - self.last_updated) > 0.25:
            self.row.update(current, total)
            self.last_updated = now
