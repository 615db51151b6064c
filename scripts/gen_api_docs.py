"""Generate the API reference from docstrings (Sphinx-autodoc analogue).

The reference ships a Sphinx docs tree whose API pages are produced by
autodoc/autosummary from the package docstrings
(ref: /root/reference/docs/conf.py, /root/reference/docs/index.rst).
Sphinx is not available in this image, so this script implements the
same contract dependency-free: walk `lightweaver_tpu`, introspect every
public module/class/function, and emit one markdown page per module
under docs/api_generated/ plus an index.  Docstrings carry the
reference file:line parity citations, so the generated pages surface
them exactly where the reference's autodoc pages would.

Run from the repo root:  python scripts/gen_api_docs.py
"""
import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

OUT = ROOT / 'docs' / 'api_generated'

SKIP_MODULES = {'lightweaver_tpu.data'}   # data files, not API


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'


def _doc(obj, indent=''):
    d = inspect.getdoc(obj)
    if not d:
        return ''
    return '\n'.join(indent + ln if ln else '' for ln in d.split('\n'))


def _is_public(name):
    return not name.startswith('_')


def _members_of(mod):
    """Public classes/functions DEFINED in this module (not re-exports),
    in source order."""
    out = []
    for name, obj in vars(mod).items():
        if not _is_public(name):
            continue
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        if getattr(obj, '__module__', None) != mod.__name__:
            continue
        try:
            _, line = inspect.getsourcelines(obj)
        except (OSError, TypeError):
            line = 1 << 30
        out.append((line, name, obj))
    out.sort(key=lambda t: t[0])
    return [(n, o) for _, n, o in out]


def _render_class(name, cls):
    lines = [f'### class `{name}{_sig(cls)}`', '']
    doc = _doc(cls)
    if doc:
        lines += [doc, '']
    bases = [b.__name__ for b in cls.__bases__ if b is not object]
    if bases:
        lines += [f'*Bases:* {", ".join(f"`{b}`" for b in bases)}', '']
    methods = []
    for mname, mobj in vars(cls).items():
        if not _is_public(mname):
            continue
        if isinstance(mobj, (staticmethod, classmethod)):
            mobj = mobj.__func__
        if isinstance(mobj, property):
            pd = inspect.getdoc(mobj)
            methods.append((f'`{mname}` *(property)*', pd or ''))
        elif inspect.isfunction(mobj):
            methods.append((f'`{mname}{_sig(mobj)}`',
                            inspect.getdoc(mobj) or ''))
    for head, doc in methods:
        lines.append(f'- **{head}**')
        if doc:
            first = doc.split('\n\n')[0].replace('\n', ' ')
            lines.append(f'  {first}')
    if methods:
        lines.append('')
    return lines


def _render_module(mod):
    lines = [f'# `{mod.__name__}`', '']
    doc = _doc(mod)
    if doc:
        lines += [doc, '']
    members = _members_of(mod)
    for name, obj in members:
        if inspect.isclass(obj):
            lines += _render_class(name, obj)
        else:
            lines += [f'### `{name}{_sig(obj)}`', '']
            d = _doc(obj)
            if d:
                lines += [d, '']
    return '\n'.join(lines) + '\n', len(members)


def main():
    import lightweaver_tpu
    OUT.mkdir(exist_ok=True)
    pages = []
    mods = ['lightweaver_tpu']
    for m in pkgutil.walk_packages(lightweaver_tpu.__path__,
                                   prefix='lightweaver_tpu.'):
        if any(m.name == s or m.name.startswith(s + '.')
               for s in SKIP_MODULES):
            continue
        mods.append(m.name)
    for name in sorted(mods):
        try:
            mod = importlib.import_module(name)
        except Exception as e:   # pragma: no cover - optional deps
            print(f'skip {name}: {e!r}')
            continue
        text, n = _render_module(mod)
        fname = name.replace('.', '_') + '.md'
        (OUT / fname).write_text(text)
        pages.append((name, fname, n))
        print(f'{name}: {n} members -> {fname}')

    idx = ['# Generated API reference', '',
           'One page per module, generated from docstrings by',
           '`scripts/gen_api_docs.py` (the Sphinx-autodoc analogue;',
           'ref docs tree: `/root/reference/docs/`).  Regenerate after',
           'changing public docstrings.', '']
    for name, fname, n in pages:
        idx.append(f'- [`{name}`]({fname}) — {n} public members')
    (OUT / 'index.md').write_text('\n'.join(idx) + '\n')
    print(f'{len(pages)} pages -> {OUT}')


if __name__ == '__main__':
    main()
