"""A minimal urwid-API-compatible shim for headless widget tests.

audiotools_tpu.ui defines its widget suite against urwid's public API
(reference audiotools/ui.py does the same).  This environment has no
urwid package, so the tests install this shim as ``sys.modules
["urwid"]`` before importing the ui module: it implements exactly the
API subset the widgets use — widgets as plain objects, container
``contents``, the signal protocol, radio/checkbox group semantics —
with no terminal rendering.  Widget logic exercised through the shim
runs identically under real urwid.
"""


class version:
    VERSION = (2, 0, 0)


CLIP = "clip"


class ExitMainLoop(Exception):
    pass


def connect_signal(widget, name, callback, user_arg=None):
    widget._signals.setdefault(name, []).append((callback, user_arg))


def emit_signal(widget, name, *args):
    for (callback, user_arg) in widget._signals.get(name, []):
        if user_arg is not None:
            callback(*(args + (user_arg,)))
        else:
            callback(*args)


class Widget:
    def __init__(self):
        self._signals = {}

    def keypress(self, size, key):
        return key


class Text(Widget):
    def __init__(self, markup, wrap=None, align=None):
        Widget.__init__(self)
        self._markup = markup

    def set_text(self, markup):
        self._markup = markup

    def get_text(self):
        if isinstance(self._markup, tuple):
            return (self._markup[1], [])
        return (self._markup, [])

    def set_wrap_mode(self, mode):
        pass

    def set_align_mode(self, mode):
        pass


class Edit(Widget):
    signals = ["change"]

    def __init__(self, caption="", edit_text="", **kwargs):
        Widget.__init__(self)
        self._caption = caption
        self._text = edit_text
        self._pos = len(edit_text)

    def get_edit_text(self):
        return self._text

    def set_edit_text(self, text):
        self._text = text
        emit_signal(self, "change", self, text)

    def set_edit_pos(self, pos):
        self._pos = pos

    def insert_text(self, text):
        self.set_edit_text(self._text[:self._pos] + text +
                           self._text[self._pos:])
        self._pos += len(text)

    def keypress(self, size, key):
        if len(key) == 1:
            self.insert_text(key)
            return None
        elif key == "backspace":
            if self._pos > 0:
                self.set_edit_text(self._text[:self._pos - 1] +
                                   self._text[self._pos:])
                self._pos -= 1
            return None
        return key


class IntEdit(Edit):
    def __init__(self, caption="", default=0):
        Edit.__init__(self, caption, str(default) if default else "")

    def value(self):
        return int(self._text) if self._text.isdigit() else 0


class Button(Widget):
    signals = ["click"]

    def __init__(self, label, on_press=None, user_data=None):
        Widget.__init__(self)
        self.label = label
        if on_press is not None:
            connect_signal(self, "click", on_press, user_data)

    def press(self):
        emit_signal(self, "click", self)

    def keypress(self, size, key):
        if key == "enter":
            self.press()
            return None
        return key


class CheckBox(Widget):
    signals = ["change"]

    def __init__(self, label, state=False, on_state_change=None,
                 user_data=None):
        Widget.__init__(self)
        self.label = label
        self._state = state
        if on_state_change is not None:
            if user_data is not None:
                connect_signal(self, "change", on_state_change,
                               user_data)
            else:
                connect_signal(self, "change", on_state_change)

    def get_state(self):
        return self._state

    def set_state(self, state, do_callback=True):
        if state == self._state:
            return
        self._state = state
        if do_callback:
            emit_signal(self, "change", self, state)


class RadioButton(CheckBox):
    def __init__(self, group, label, state="first True",
                 on_state_change=None, user_data=None):
        if state == "first True":
            state = (len(group) == 0)
        CheckBox.__init__(self, label, state, on_state_change,
                          user_data)
        self.group = group
        group.append(self)
        self._label = Text(label)

    def set_state(self, state, do_callback=True):
        if state == self._state:
            return
        CheckBox.set_state(self, state, do_callback)
        if state:
            for other in self.group:
                if other is not self:
                    other.set_state(False, do_callback)


class _Container(Widget):
    """shared contents handling for Columns/Pile"""

    def __init__(self, widget_list, **kwargs):
        Widget.__init__(self)
        self.contents = []
        for item in widget_list:
            if isinstance(item, tuple):
                if len(item) == 3:
                    (sizing, amount, widget) = item
                    self.contents.append((widget, (sizing, amount)))
                else:
                    (sizing, widget) = item
                    self.contents.append((widget, (sizing, None)))
            else:
                self.contents.append((item, ("weight", 1)))
        self._focus = 0

    def set_focus(self, index):
        self._focus = index

    @property
    def widget_list(self):
        return _WidgetListProxy(self)


class _WidgetListProxy:
    def __init__(self, container):
        self.container = container

    def __getitem__(self, index):
        return self.container.contents[index][0]

    def __setitem__(self, index, widget):
        options = self.container.contents[index][1]
        self.container.contents[index] = (widget, options)


class Columns(_Container):
    def __init__(self, widget_list, dividechars=0, focus_column=None):
        _Container.__init__(self, widget_list)


class Pile(_Container):
    pass


class ListBox(Widget):
    def __init__(self, body):
        Widget.__init__(self)
        self.body = body


class SimpleListWalker(list):
    pass


class SimpleFocusListWalker(list):
    pass


class Frame(Widget):
    def __init__(self, body=None, header=None, footer=None):
        Widget.__init__(self)
        self._body = body
        self._header = header
        self._footer = footer

    def set_body(self, body):
        self._body = body

    def set_header(self, header):
        self._header = header

    def set_footer(self, footer):
        self._footer = footer

    def get_body(self):
        return self._body

    def get_footer(self):
        return self._footer

    def set_focus(self, part):
        self._focus = part


class LineBox(Widget):
    def __init__(self, widget, title=None):
        Widget.__init__(self)
        self.original_widget = widget
        self.title = title

    def set_title(self, title):
        self.title = title


class Filler(Widget):
    def __init__(self, widget, **kwargs):
        Widget.__init__(self)
        self.original_widget = widget


class Divider(Widget):
    def __init__(self, div_char=" "):
        Widget.__init__(self)


class AttrMap(Widget):
    def __init__(self, widget, attr, focus_map=None):
        Widget.__init__(self)
        self.original_widget = widget


class WidgetWrap(Widget):
    def __init__(self, widget):
        Widget.__init__(self)
        self._w = widget


class ProgressBar(Widget):
    def __init__(self, normal, complete, current=0, done=100):
        Widget.__init__(self)
        self.current = current
        self.done = done

    def set_completion(self, current):
        self.current = current


class PopUpLauncher(Widget):
    def __init__(self, widget):
        Widget.__init__(self)
        self.original_widget = widget


class MainLoop:
    def __init__(self, widget, palette=None, unhandled_input=None,
                 pop_ups=False, **kwargs):
        self.widget = widget
        self.unhandled_input = unhandled_input

    def run(self):
        raise NotImplementedError(
            "the shim has no event loop; drive widgets directly")
