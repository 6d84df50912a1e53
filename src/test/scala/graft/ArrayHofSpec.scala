package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ClickHouseFunctions

/** CH array higher-order pack: lambda-first argument order, the
  * ArrayAggregate-rooted folds (count/first/sum), key-function sorts, and
  * the slice/push/pop/enumerate/range surface. Each case pins a semantics
  * choice the f15 oracle relies on (empty-array results, arrayFirst's
  * NULL-on-absent divergence from CH's default(T), arraySum widening).
  */
class ArrayHofSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val ready = { ClickHouseFunctions.register(spark); true }

  private def sql1(q: String): Any = { ready; spark.sql(q).head().get(0) }

  test("arrayMap / arrayFilter / arrayExists / arrayAll — lambda first") {
    assert(sql1("SELECT arrayMap(x -> x * 2, array(1, 2, 3))") ===
      Seq(2, 4, 6))
    assert(sql1("SELECT arrayFilter(x -> x % 2 = 0, array(1, 2, 3, 4))") ===
      Seq(2, 4))
    assert(sql1("SELECT arrayExists(x -> x > 2, array(1, 2, 3))") === true)
    assert(sql1("SELECT arrayExists(x -> x > 9, array(1, 2, 3))") === false)
    assert(sql1("SELECT arrayAll(x -> x > 0, array(1, 2, 3))") === true)
    assert(sql1("SELECT arrayAll(x -> x > 1, array(1, 2, 3))") === false)
  }

  test("2-array arrayMap is ZipWith (CH n-ary form)") {
    assert(sql1(
      "SELECT arrayMap((x, y) -> x * y, array(1, 2, 3), array(10, 20, 30))") ===
      Seq(10, 40, 90))
  }

  test("arrayCount / arrayFirst fold forms") {
    assert(sql1("SELECT arrayCount(x -> x > 1, array(1, 2, 3))") === 2)
    assert(sql1("SELECT arrayCount(x -> x > 9, array(1, 2, 3))") === 0)
    assert(sql1("SELECT arrayFirst(x -> x > 1, array(1, 2, 3))") === 2)
    // CH returns default(T)=0 here; our ANSI divergence is NULL (documented)
    assert(sql1("SELECT arrayFirst(x -> x > 9, array(1, 2, 3))") === null)
    assert(sql1("SELECT arrayFirst(w -> length(w) = 2, array('a','bb','cc'))") ===
      "bb")
  }

  test("arraySum / arrayAvg / arrayMin / arrayMax with CH widening") {
    assert(sql1("SELECT arraySum(array(1, 2, 3))") === 6L)
    assert(sql1("SELECT arraySum(x -> x * x, array(1, 2, 3))") === 14L)
    assert(sql1("SELECT arraySum(array())") === 0L)
    assert(sql1("SELECT arrayAvg(array(1, 2, 3, 4))") === 2.5)
    assert(sql1("SELECT arrayMin(array(3, 1, 2))") === 1)
    assert(sql1("SELECT arrayMax(array(3, 1, 2))") === 3)
  }

  test("arraySort / arrayReverseSort, plain and key-function") {
    assert(sql1("SELECT arraySort(array(3, 1, 2))") === Seq(1, 2, 3))
    assert(sql1("SELECT arrayReverseSort(array(3, 1, 2))") === Seq(3, 2, 1))
    // key sort: by length, ties by element value (deterministic both engines)
    assert(sql1(
      "SELECT arraySort(w -> length(w), array('ccc', 'a', 'bb', 'ab'))") ===
      Seq("a", "ab", "bb", "ccc"))
    assert(sql1(
      "SELECT arrayReverseSort(w -> length(w), array('ccc', 'a', 'bb', 'ab'))") ===
      Seq("ccc", "bb", "ab", "a"))
  }

  test("distinct / uniq / concat / slice / reverse / flatten") {
    assert(sql1("SELECT arrayDistinct(array(1, 2, 1, 3, 2))") === Seq(1, 2, 3))
    assert(sql1("SELECT arrayUniq(array(1, 2, 1, 3, 2))") === 3)
    assert(sql1("SELECT arrayConcat(array(1, 2), array(3), array(4))") ===
      Seq(1, 2, 3, 4))
    // CH arraySlice: 1-based, negative offset from the end, no-length = rest
    assert(sql1("SELECT arraySlice(array(1, 2, 3, 4), 2)") === Seq(2, 3, 4))
    assert(sql1("SELECT arraySlice(array(1, 2, 3, 4), 2, 2)") === Seq(2, 3))
    assert(sql1("SELECT arraySlice(array(1, 2, 3, 4), -2)") === Seq(3, 4))
    assert(sql1("SELECT arrayReverse(array(1, 2, 3))") === Seq(3, 2, 1))
    assert(sql1("SELECT arrayFlatten(array(array(1, 2), array(3)))") ===
      Seq(1, 2, 3))
  }

  test("push/pop family and empty-array edges") {
    assert(sql1("SELECT arrayPushBack(array(1, 2), 3)") === Seq(1, 2, 3))
    assert(sql1("SELECT arrayPushFront(array(1, 2), 0)") === Seq(0, 1, 2))
    assert(sql1("SELECT arrayPopBack(array(1, 2, 3))") === Seq(1, 2))
    assert(sql1("SELECT arrayPopFront(array(1, 2, 3))") === Seq(2, 3))
    assert(sql1("SELECT arrayPopBack(array(7))") === Seq.empty)
    assert(sql1("SELECT arrayPopFront(array(7))") === Seq.empty)
  }

  test("JSON pack: key extraction, has, array length") {
    val doc = """'{"a":"x","n":5,"f":2.5,"b":true,"t":[1,2,3]}'"""
    assert(sql1(s"SELECT JSONExtractString($doc, 'a')") === "x")
    assert(sql1(s"SELECT JSONExtractInt($doc, 'n')") === 5L)
    assert(sql1(s"SELECT JSONExtractFloat($doc, 'f')") === 2.5)
    assert(sql1(s"SELECT JSONExtractBool($doc, 'b')") === true)
    assert(sql1(s"SELECT JSONHas($doc, 'a')") === true)
    assert(sql1(s"SELECT JSONHas($doc, 'zz')") === false)
    assert(sql1(s"SELECT JSONLength(JSONExtractString($doc, 't'))") === 3)
    assert(sql1(s"SELECT JSONExtractString($doc, 'missing')") === null)
    // explicit JSONPath passes through untouched
    assert(sql1(s"SELECT JSONExtractString($doc, '$$.a')") === "x")
  }

  test("IPv4 conversions: dotted quad round-trip and golden vectors") {
    assert(sql1("SELECT IPv4NumToString(167774729)") === "10.0.10.9")
    assert(sql1("SELECT IPv4NumToString(0)") === "0.0.0.0")
    assert(sql1("SELECT IPv4NumToString(4294967295)") === "255.255.255.255")
    assert(sql1("SELECT IPv4StringToNum('10.0.10.9')") === 167774729L)
    assert(sql1("SELECT IPv4StringToNum('255.255.255.255')") === 4294967295L)
    assert(sql1(
      "SELECT IPv4StringToNum(IPv4NumToString(3232235777))") === 3232235777L)
  }

  test("conditionals / tuples / arrayReduce pack") {
    assert(sql1("SELECT if(1 = 1, 'y', 'n')") === "y")
    assert(sql1("SELECT if(1 = 2, 'y', 'n')") === "n")
    assert(sql1("SELECT multiIf(false, 1, true, 2, 3)") === 2)
    assert(sql1("SELECT multiIf(false, 1, false, 2, 3)") === 3)
    assert(sql1("SELECT tupleElement(tuple('a', 5), 1)") === "a")
    assert(sql1("SELECT tupleElement(tuple('a', 5), 2)") === 5)
    assert(sql1("SELECT arrayReduce('sum', array(1, 2, 3))") === 6L)
    assert(sql1("SELECT arrayReduce('min', array(3, 1, 2))") === 1)
    assert(sql1("SELECT arrayReduce('max', array(3, 1, 2))") === 3)
    assert(sql1("SELECT arrayReduce('avg', array(1, 2, 3, 4))") === 2.5)
    assert(sql1("SELECT arrayReduce('count', array(7, 8))") === 2)
    assert(sql1("SELECT arrayReduce('uniq', array(1, 1, 2))") === 2)
    assert(sql1("SELECT arraySort(arrayIntersect(array(1, 2, 3), array(3, 1, 9)))") ===
      Seq(1, 3))
    assert(sql1("SELECT arrayWithConstant(3, 'x')") === Seq("x", "x", "x"))
    assert(sql1("SELECT arrayElement(array(10, 20, 30), -1)") === 30)
    assert(sql1("SELECT arrayElement(array(10), 5)") === null) // CH: default(T)
    assert(sql1("SELECT countEqual(array(1, 2, 1, 1), 1)") === 3)
  }

  test("string pack #3: position order, countSubstrings, trim/pad, split") {
    // CH position is (haystack, needle), 1-based, 0 when absent
    assert(sql1("SELECT position('NATION', 'A')") === 2)
    assert(sql1("SELECT position('NATION', 'zz')") === 0)
    assert(sql1("SELECT positionCaseInsensitive('NATION', 'a')") === 2)
    // non-overlapping occurrence count; empty needle -> 0
    assert(sql1("SELECT countSubstrings('banana', 'an')") === 2)
    assert(sql1("SELECT countSubstrings('aaaa', 'aa')") === 2)
    assert(sql1("SELECT countSubstrings('abc', '')") === 0)
    assert(sql1("SELECT startsWith('NATION', 'NA')") === true)
    assert(sql1("SELECT trimBoth('  x ')") === "x")
    assert(sql1("SELECT trimLeft('  x ')") === "x ")
    assert(sql1("SELECT trimRight('  x ')") === "  x")
    assert(sql1("SELECT leftPad('ab', 5, '.')") === "...ab")
    assert(sql1("SELECT rightPad('ab', 5, '.')") === "ab...")
    assert(sql1("SELECT leftPad('abcdef', 3, '.')") === "abc") // truncates
    assert(sql1("SELECT substringUTF8('abcdef', 2, 3)") === "bcd")
    assert(sql1("SELECT substringUTF8('abcdef', 4)") === "def")
    assert(sql1("SELECT concatWithSeparator('-', 'a', 'b', 'c')") === "a-b-c")
    assert(sql1("SELECT splitByString('::', 'a::b::')") === Seq("a", "b", ""))
  }

  test("format/encode pack: formatDateTime codes, base64, hex, shifts") {
    val ts = "TIMESTAMP '2024-03-07 09:05:02'"
    assert(sql1(s"SELECT formatDateTime($ts, '%Y-%m-%d %H:%M:%S')") ===
      "2024-03-07 09:05:02")
    assert(sql1(s"SELECT formatDateTime($ts, '%F')") === "2024-03-07")
    assert(sql1(s"SELECT formatDateTime($ts, '%T')") === "09:05:02")
    assert(sql1(s"SELECT formatDateTime($ts, 'day %j of %Y')") ===
      "day 067 of 2024")
    assert(sql1(s"SELECT formatDateTime($ts, '%d/%m/%y 100%%')") ===
      "07/03/24 100%")
    intercept[Exception](sql1(s"SELECT formatDateTime($ts, '%Q')"))
    assert(sql1("SELECT base64Encode('hi')") === "aGk=")
    assert(sql1("SELECT base64Decode('aGk=')") === "hi")
    assert(sql1("SELECT lower(hex('hi'))") === "6869")
    assert(sql1("SELECT bitShiftLeft(3, 2)") === 12)
    assert(sql1("SELECT bitShiftRight(12, 2)") === 3)
  }

  test("toISOWeek / toRelativeDayNum") {
    assert(sql1("SELECT toISOWeek(DATE '2024-01-04')") === 1)
    assert(sql1("SELECT toISOWeek(DATE '2021-01-01')") === 53) // ISO: week of prior year
    assert(sql1("SELECT toRelativeDayNum(DATE '1970-01-02')") === 1)
    assert(sql1("SELECT toRelativeDayNum(TIMESTAMP '2024-01-01 10:00:00')") ===
      19723)
  }

  test("arrayEnumerate / range with empty guards") {
    assert(sql1("SELECT arrayEnumerate(array('a', 'b', 'c'))") === Seq(1, 2, 3))
    assert(sql1("SELECT arrayEnumerate(arrayPopBack(array(1)))") === Seq.empty)
    assert(sql1("SELECT range(4)") === Seq(0, 1, 2, 3))
    assert(sql1("SELECT range(0)") === Seq.empty)
    assert(sql1("SELECT range(2, 5)") === Seq(2, 3, 4))
    assert(sql1("SELECT range(5, 5)") === Seq.empty)
  }
}
