"""Tests for the mini-JS interpreter (utils/minijs.py), the QuickJS analog
used by external recommenders (reference: logics/external.go:29-101)."""

import math

import pytest

from gorse_tpu.utils.minijs import (
    UNDEFINED,
    Interpreter,
    JSError,
    JSSyntaxError,
    JSThrow,
    js_str,
    to_python,
)


def ev(src, **globals_):
    i = Interpreter()
    for k, v in globals_.items():
        i.set_global(k, v)
    return i.eval(src)


class TestLiteralsAndOperators:
    def test_arithmetic(self):
        assert ev("1 + 2 * 3 - 4 / 2") == 5.0
        assert ev("2 ** 10") == 1024.0
        assert ev("7 % 3") == 1.0
        assert ev("-7 % 3") == -1.0  # JS fmod semantics
        assert ev("0x10 + 0b101 + 0o17") == 16 + 5 + 15

    def test_string_concat(self):
        assert ev("'a' + 'b'") == "ab"
        assert ev("'n=' + 5") == "n=5"
        assert ev("1 + '2'") == "12"
        assert ev("'' + [1,2]") == "1,2"
        assert ev("'' + {}") == "[object Object]"
        assert ev("'' + null + undefined") == "nullundefined"

    def test_number_formatting(self):
        assert ev("'' + 1.0") == "1"
        assert ev("'' + 1.5") == "1.5"
        assert ev("'' + (1/3)").startswith("0.3333")
        assert ev("'' + (0/0)") == "NaN"
        assert ev("'' + (1/0)") == "Infinity"

    def test_comparison(self):
        assert ev("1 < 2 && 2 <= 2 && 3 > 2 && 3 >= 3") is True
        assert ev("'a' < 'b'") is True
        assert ev("NaN == NaN") is False
        assert ev("null == undefined") is True
        assert ev("null === undefined") is False
        assert ev("1 == '1'") is True
        assert ev("1 === '1'") is False
        assert ev("true == 1") is True

    def test_logical(self):
        assert ev("0 || 'x'") == "x"
        assert ev("1 && 'y'") == "y"
        assert ev("null ?? 'z'") == "z"
        assert ev("0 ?? 'z'") == 0.0
        assert ev("!''") is True

    def test_ternary_and_comma(self):
        assert ev("1 ? 'a' : 'b'") == "a"
        assert ev("(1, 2, 3)") == 3.0

    def test_bitwise(self):
        assert ev("5 & 3") == 1.0
        assert ev("5 | 3") == 7.0
        assert ev("5 ^ 3") == 6.0
        assert ev("~5") == -6.0
        assert ev("1 << 4") == 16.0
        assert ev("-16 >> 2") == -4.0
        assert ev("-1 >>> 28") == 15.0

    def test_typeof(self):
        assert ev("typeof 1") == "number"
        assert ev("typeof 'x'") == "string"
        assert ev("typeof true") == "boolean"
        assert ev("typeof undefined") == "undefined"
        assert ev("typeof null") == "object"
        assert ev("typeof {}") == "object"
        assert ev("typeof [].map") == "function"
        assert ev("typeof not_defined_anywhere") == "undefined"

    def test_update_and_compound_assign(self):
        assert ev("var x = 1; x++; x") == 2.0
        assert ev("var x = 1; x++") == 1.0
        assert ev("var x = 1; ++x") == 2.0
        assert ev("var x = 10; x -= 3; x *= 2; x") == 14.0
        assert ev("var o = {n: 1}; o.n += 5; o.n") == 6.0
        assert ev("var a = [1]; a[0]++; a[0]") == 2.0


class TestControlFlow:
    def test_if_while_for(self):
        assert ev("var s = 0; for (var i = 0; i < 5; i++) s += i; s") == 10.0
        assert ev("var s = 0; var i = 0; while (i < 4) { s += i; i++ } s") == 6.0
        assert ev("var n = 0; do { n++ } while (n < 3); n") == 3.0
        assert ev("if (false) 1; else 2") == 2.0

    def test_break_continue(self):
        src = """
        var s = 0;
        for (var i = 0; i < 10; i++) {
            if (i == 3) continue;
            if (i == 6) break;
            s += i;
        }
        s
        """
        assert ev(src) == 0 + 1 + 2 + 4 + 5

    def test_for_of_for_in(self):
        assert ev("var s = 0; for (const x of [1,2,3]) s += x; s") == 6.0
        assert ev("var ks = []; for (var k in {a:1, b:2}) ks.push(k); ks.join()") == "a,b"
        assert ev("var s = ''; for (const c of 'abc') s += c + '.'; s") == "a.b.c."

    def test_switch(self):
        src = """
        function f(x) {
            switch (x) {
                case 1: return 'one';
                case 2:
                case 3: return 'few';
                default: return 'many';
            }
        }
        f(1) + ',' + f(2) + ',' + f(3) + ',' + f(9)
        """
        assert ev(src) == "one,few,few,many"

    def test_switch_fallthrough(self):
        src = """
        var log = [];
        switch (2) {
            case 1: log.push('a');
            case 2: log.push('b');
            case 3: log.push('c'); break;
            case 4: log.push('d');
        }
        log.join('')
        """
        assert ev(src) == "bc"

    def test_try_catch_finally(self):
        assert ev("var r; try { throw new Error('boom') } catch (e) { r = e.message } r") == "boom"
        assert ev("var r = []; try { r.push(1); throw 'x' } catch (e) { r.push(2) } finally { r.push(3) } r.join()") == "1,2,3"
        assert ev("try { null.x } catch (e) { e.name }") == "TypeError"
        # catch without a binding
        assert ev("var ok = 0; try { undefined_fn() } catch { ok = 1 } ok") == 1.0

    def test_throw_propagates_to_host(self):
        with pytest.raises(JSThrow) as ei:
            ev("throw new TypeError('nope')")
        assert ei.value.value["message"] == "nope"


class TestFunctions:
    def test_declarations_and_closures(self):
        src = """
        function counter() {
            var n = 0;
            return function () { n += 1; return n; };
        }
        var c = counter();
        c(); c(); c()
        """
        assert ev(src) == 3.0

    def test_hoisting(self):
        assert ev("f(); function f() { return 1 } f()") == 1.0

    def test_arrows(self):
        assert ev("[1,2,3].map(x => x * 2).join()") == "2,4,6"
        assert ev("((a, b) => a + b)(2, 3)") == 5.0
        assert ev("(() => 42)()") == 42.0
        assert ev("((a, b = 10) => a + b)(1)") == 11.0

    def test_rest_and_spread(self):
        assert ev("function f(...xs) { return xs.length } f(1,2,3)") == 3.0
        assert ev("function f(a, ...rest) { return rest.join() } f(1,2,3)") == "2,3"
        assert ev("Math.max(...[3, 1, 4, 1, 5])") == 5.0
        assert ev("[0, ...[1,2], 3].join()") == "0,1,2,3"

    def test_this_and_methods(self):
        src = """
        var obj = {
            n: 41,
            get() { return this.n + 1 }
        };
        obj.get()
        """
        assert ev(src) == 42.0

    def test_arrow_lexical_this(self):
        src = """
        var obj = {
            n: 5,
            collect() { return [1,2].map(x => x + this.n).join() }
        };
        obj.collect()
        """
        assert ev(src) == "6,7"

    def test_call_apply_bind(self):
        assert ev("function f(a) { return this.x + a } f.call({x: 1}, 2)") == 3.0
        assert ev("function f(a, b) { return this.x + a + b } f.apply({x: 1}, [2, 3])") == 6.0
        assert ev("function f(a, b) { return this.x + a + b } var g = f.bind({x: 10}, 1); g(2)") == 13.0

    def test_arguments(self):
        assert ev("function f() { return arguments.length } f(1, 2, 3)") == 3.0

    def test_new_constructor(self):
        src = """
        function Point(x, y) { this.x = x; this.y = y }
        var p = new Point(3, 4);
        Math.sqrt(p.x * p.x + p.y * p.y)
        """
        assert ev(src) == 5.0

    def test_recursion_cap(self):
        with pytest.raises(JSThrow) as ei:
            ev("function f() { return f() } f()")
        assert "call stack" in ei.value.value["message"]


class TestObjectsAndArrays:
    def test_object_literals(self):
        assert ev("var k = 'dyn'; ({a: 1, 'b c': 2, [k]: 3, 4: 'four'})['b c']") == 2.0
        assert ev("var a = 7; ({a}).a") == 7.0
        assert ev("({...{a:1}, b:2}).a") == 1.0

    def test_property_access(self):
        assert ev("var o = {}; o.x = 1; o['y'] = 2; o.x + o.y") == 3.0
        assert ev("({a: 1}).missing") is UNDEFINED
        assert ev("'abc'.length") == 3.0
        assert ev("'abc'[1]") == "b"
        assert ev("[10, 20][1]") == 20.0
        assert ev("[1,2,3].length") == 3.0
        assert ev("delete ({a:1}).a") is True
        assert ev("var o = {a:1}; delete o.a; 'a' in o") is False
        assert ev("'a' in {a: 1}") is True
        assert ev("0 in [5]") is True

    def test_optional_chaining(self):
        assert ev("var o = null; o?.x") is UNDEFINED
        assert ev("var o = {x: {y: 3}}; o?.x?.y") == 3.0

    def test_array_mutators(self):
        assert ev("var a = [1]; a.push(2, 3); a.join()") == "1,2,3"
        assert ev("var a = [1,2,3]; a.pop() + a.length") == 5.0
        assert ev("var a = [1,2,3]; a.shift(); a.join()") == "2,3"
        assert ev("var a = [2]; a.unshift(1); a.join()") == "1,2"
        assert ev("var a = [1,2,3,4]; a.splice(1, 2, 'x'); a.join()") == "1,x,4"
        assert ev("var a = [3,1,2]; a.sort(); a.join()") == "1,2,3"
        assert ev("var a = [1,2,3]; a.sort((x,y) => y-x); a.join()") == "3,2,1"
        assert ev("var a = [1,2]; a.reverse(); a.join()") == "2,1"
        assert ev("var a = [0,0,0]; a.fill(7, 1); a.join()") == "0,7,7"
        assert ev("var a = [1]; a.length = 3; a.length") == 3.0
        assert ev("var a = [1,2,3]; a.length = 1; a.join()") == "1"

    def test_array_iteration(self):
        assert ev("[1,2,3].map(x => x + 1).join()") == "2,3,4"
        assert ev("[1,2,3,4].filter(x => x % 2 == 0).join()") == "2,4"
        assert ev("[1,2,3].reduce((a, b) => a + b)") == 6.0
        assert ev("[1,2,3].reduce((a, b) => a + b, 10)") == 16.0
        assert ev("[1,2,3].find(x => x > 1)") == 2.0
        assert ev("[1,2,3].findIndex(x => x > 1)") == 1.0
        assert ev("[1,2,3].some(x => x > 2)") is True
        assert ev("[1,2,3].every(x => x > 0)") is True
        assert ev("[1,2,3].indexOf(2)") == 1.0
        assert ev("[1,2,3].includes(3)") is True
        assert ev("[[1,2],[3]].flat().join()") == "1,2,3"
        assert ev("[1,2].flatMap(x => [x, x]).join()") == "1,1,2,2"
        assert ev("[1,2,3].slice(1).join()") == "2,3"
        assert ev("[1,2,3].slice(-2).join()") == "2,3"
        assert ev("['a','b'].concat(['c'], 'd').join()") == "a,b,c,d"
        assert ev("[1,2,3].at(-1)") == 3.0

    def test_object_builtins(self):
        assert ev("Object.keys({a:1, b:2}).join()") == "a,b"
        assert ev("Object.values({a:1, b:2}).join()") == "1,2"
        assert ev("JSON.stringify(Object.entries({a:1}))") == '[["a",1]]'
        assert ev("Object.assign({a:1}, {b:2}).b") == 2.0
        assert ev("Object.fromEntries([['a', 1]]).a") == 1.0
        assert ev("Array.isArray([])") is True
        assert ev("Array.isArray({})") is False
        assert ev("Array.from('ab').join()") == "a,b"
        assert ev("Array.from([1,2], x => x * 10).join()") == "10,20"
        assert ev("({a:1}).hasOwnProperty('a')") is True

    def test_instanceof(self):
        assert ev("[] instanceof Array") is True
        assert ev("({}) instanceof Object") is True
        assert ev("new Error('x') instanceof Error") is True
        src = "function T(){}; new T() instanceof Array"
        assert ev(src) is False


class TestStrings:
    def test_methods(self):
        assert ev("'Hello'.toUpperCase()") == "HELLO"
        assert ev("'Hello'.toLowerCase()") == "hello"
        assert ev("' x '.trim()") == "x"
        assert ev("'a,b,c'.split(',').length") == 3.0
        assert ev("'abc'.split('').join('-')") == "a-b-c"
        assert ev("'hello'.indexOf('ll')") == 2.0
        assert ev("'hello'.includes('ell')") is True
        assert ev("'hello'.startsWith('he')") is True
        assert ev("'hello'.endsWith('lo')") is True
        assert ev("'hello'.slice(1, 3)") == "el"
        assert ev("'hello'.slice(-2)") == "lo"
        assert ev("'hello'.substring(3, 1)") == "el"
        assert ev("'ab'.repeat(3)") == "ababab"
        assert ev("'a-b-a'.replace('a', 'x')") == "x-b-a"
        assert ev("'a-b-a'.replaceAll('a', 'x')") == "x-b-x"
        assert ev("'5'.padStart(3, '0')") == "005"
        assert ev("'5'.padEnd(3, '.')") == "5.."
        assert ev("'abc'.charAt(1)") == "b"
        assert ev("'abc'.charCodeAt(0)") == 97.0

    def test_template_literals(self):
        assert ev("var name = 'world'; `hello ${name}!`") == "hello world!"
        assert ev("`${1 + 2} = ${'3'}`") == "3 = 3"
        assert ev("`a${`b${1}c`}d`") == "ab1cd"
        assert ev("`line1\nline2`") == "line1\nline2"

    def test_escapes(self):
        assert ev(r"'a\nb\t\x41B\u{1F600}'") == "a\nb\tAB\U0001f600"


class TestBuiltins:
    def test_json_round_trip(self):
        assert ev("JSON.parse('[1, 2, 3]').length") == 3.0
        assert ev("JSON.parse('{\"a\": {\"b\": [true, null]}}').a.b[0]") is True
        assert ev("JSON.stringify([1, 'x', null, true])") == '[1,"x",null,true]'
        assert ev("JSON.stringify({u: undefined, f: Math.floor})") == "{}"
        assert ev("JSON.stringify([undefined])") == "[null]"
        assert ev("JSON.stringify(NaN)") == "null"
        out = ev("JSON.stringify({a: [1]}, null, 2)")
        assert out == '{\n  "a": [\n    1\n  ]\n}'

    def test_json_circular_throws(self):
        with pytest.raises(JSThrow):
            ev("var o = {}; o.self = o; JSON.stringify(o)")

    def test_json_parse_error(self):
        with pytest.raises(JSThrow):
            ev("JSON.parse('{bad')")
        assert ev("try { JSON.parse('{') } catch (e) { e.name }") == "SyntaxError"

    def test_math(self):
        assert ev("Math.max(1, 5, 3)") == 5.0
        assert ev("Math.min()") == math.inf
        assert ev("Math.floor(1.9)") == 1.0
        assert ev("Math.ceil(1.1)") == 2.0
        assert ev("Math.round(2.5)") == 3.0
        assert ev("Math.round(-2.5)") == -2.0  # JS half-up
        assert ev("Math.abs(-4)") == 4.0
        assert ev("Math.sqrt(16)") == 4.0
        assert ev("Math.pow(2, 8)") == 256.0
        assert ev("Math.sign(-3)") == -1.0
        assert 0 <= ev("Math.random()") < 1

    def test_parse_numbers(self):
        assert ev("parseInt('42px')") == 42.0
        assert ev("parseInt('ff', 16)") == 255.0
        assert ev("parseInt('0x1A')") == 26.0
        assert math.isnan(ev("parseInt('nope')"))
        assert ev("parseFloat('3.14 rads')") == pytest.approx(3.14)
        assert ev("parseFloat('1e3')") == 1000.0
        assert ev("isNaN('abc')") is True
        assert ev("isFinite(42)") is True
        assert ev("Number('12.5')") == 12.5
        assert ev("Number.isInteger(5)") is True
        assert ev("Number.isInteger(5.5)") is False
        assert ev("String(12)") == "12"
        assert ev("Boolean('')") is False

    def test_number_methods(self):
        assert ev("(3.14159).toFixed(2)") == "3.14"
        assert ev("(255).toString(16)") == "ff"
        assert ev("(1.0).toString()") == "1"

    def test_uri(self):
        assert ev("encodeURIComponent('a b&c')") == "a%20b%26c"
        assert ev("decodeURIComponent('a%20b')") == "a b"

    def test_date_now(self):
        assert ev("Date.now()") > 1.7e12


class TestHostIntegration:
    def test_set_global_and_completion_value(self):
        assert ev("user_id + '!'", user_id="u1") == "u1!"
        # completion value is the last expression statement, like QuickJS Eval
        assert ev("var a = 1; a + 1; var b = 0;") == 2.0
        assert ev("var a = 1;") is UNDEFINED

    def test_register_native(self):
        i = Interpreter()
        calls = []

        def fetch(url, opts=UNDEFINED):
            calls.append((url, to_python(opts)))
            return {"ok": True, "status": 200.0, "body": '["i1","i2"]'}

        i.register("fetch", fetch)
        out = i.eval("""
        var resp = fetch('http://x/recommend', {method: 'POST'});
        resp.ok ? JSON.parse(resp.body) : []
        """)
        assert out == ["i1", "i2"]
        assert calls[0][0] == "http://x/recommend"
        assert calls[0][1]["method"] == "POST"

    def test_native_throw_surfaces_as_catchable(self):
        i = Interpreter()

        def boom():
            raise JSThrow({"name": "Error", "message": "native boom"})

        i.register("boom", boom)
        assert i.eval("try { boom() } catch (e) { e.message }") == "native boom"

    def test_js_function_callable_from_python(self):
        i = Interpreter()
        i.eval("function add(a, b) { return a + b }")
        fn = i.global_env.get("add")
        assert fn(2.0, 3.0) == 5.0

    def test_to_python(self):
        v = ev("({a: [1, undefined], b: 'x'})")
        assert to_python(v) == {"a": [1.0, None], "b": "x"}

    def test_js_str(self):
        assert js_str([1.0, None, UNDEFINED, "a"]) == "1,,,a"


class TestSafety:
    def test_infinite_loop_budget(self):
        i = Interpreter(max_ops=50_000)
        with pytest.raises(JSError, match="budget"):
            i.eval("while (true) {}")

    def test_budget_resets_per_eval(self):
        i = Interpreter(max_ops=50_000)
        for _ in range(5):
            assert i.eval("var s = 0; for (var k = 0; k < 100; k++) s += k; s") == 4950.0

    def test_huge_repeat_blocked(self):
        with pytest.raises((JSError, JSThrow)):
            ev("'x'.repeat(1e9)")

    def test_syntax_errors(self):
        for bad in ["var", "1 +", "function (", "{a:", "if (x", "'unterminated",
                    "`unterminated ${1}", "do { } wile (1)"]:
            with pytest.raises(JSSyntaxError):
                ev(bad)

    def test_runtime_errors_catchable(self):
        assert ev("try { missing_fn() } catch (e) { e.name }") == "ReferenceError"
        assert ev("try { var x; x.y } catch (e) { e.name }") == "TypeError"
        assert ev("try { (5)() } catch (e) { e.name }") == "TypeError"


class TestASI:
    def test_semicolonless(self):
        src = """
        var a = 1
        var b = 2
        function f(x) { return x + 1 }
        f(a + b)
        """
        assert ev(src) == 4.0

    def test_return_restricted_production(self):
        src = """
        function f() {
            return
            42
        }
        f()
        """
        assert ev(src) is UNDEFINED


class TestRecommenderScript:
    """The shape of script the external recommender hook actually runs
    (reference: logics/external_test.go)."""

    def test_end_to_end_script(self):
        i = Interpreter()
        i.set_global("user_id", "alice")

        def fetch(url, opts=UNDEFINED):
            assert "alice" in url
            return {
                "ok": True,
                "status": 200.0,
                "statusText": "200 OK",
                "headers": {"Content-Type": "application/json"},
                "body": '{"items": [{"id": "i9", "score": 2}, {"id": "i4", "score": 7}]}',
            }

        i.register("fetch", fetch)
        out = i.eval("""
        var resp = fetch('http://upstream/recs?user=' + encodeURIComponent(user_id));
        if (!resp.ok) {
            JSON.stringify([]);
        } else {
            var items = JSON.parse(resp.body).items;
            items.sort(function (a, b) { return b.score - a.score });
            JSON.stringify(items.map(function (it) { return it.id }));
        }
        """)
        assert out == '["i4","i9"]'


def test_optional_call_on_missing_method():
    """a.b?.() short-circuits to undefined (review finding)."""
    assert ev("let a = {}; a.missing?.() === undefined") is True
    assert ev("let a = {f: () => 7}; a.f?.()") == 7
    assert ev("let a = null; a?.f() === undefined") is True


def test_compound_assignment_single_base_eval():
    """counts[next()] += 1 evaluates next() once (review finding)."""
    src = """
    let calls = 0;
    function next() { calls++; return 0; }
    let counts = [10];
    counts[next()] += 1;
    [calls, counts[0]]
    """
    assert ev(src) == [1.0, 11.0]
    src2 = """
    let calls = 0;
    function obj() { calls++; return state; }
    let state = {total: 5};
    obj().total++;
    [calls, state.total]
    """
    assert ev(src2) == [1.0, 6.0]
