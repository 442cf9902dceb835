#!/usr/bin/env python3
"""Generates src/main/scala/htmlspark/encoding/EncodingLabels.scala — the
full WHATWG encoding-label registry (label -> canonical encoding name) plus
the canonical-name -> JDK charset mapping.

The REGISTRY dict below is a transcription of the public WHATWG
encodings.json (https://encoding.spec.whatwg.org/encodings.json): one entry
per encoding, listing every label the spec maps to it. This sandbox has no
egress, so the data is embedded rather than fetched; it is the same public
dataset pattern as gen_entities.py.

JDK notes (probed on the build JDK, 17):
 - ISO-8859-10 and ISO-8859-14 have NO JDK decoder -> mapped to None in
   nameToJdk; instead this script emits their 0xA0-0xFF decode tables
   (generated from Python's stdlib iso8859_10/iso8859_14 codecs, which
   carry the same public single-byte index the WHATWG spec publishes),
   and EncodingSniffer table-decodes them like windows-1252.
 - WHATWG Shift_JIS index == Windows code page 932 -> JDK windows-31j.
 - WHATWG EUC-KR index == Windows code page 949 -> JDK x-windows-949.
 - WHATWG windows-874 -> JDK x-windows-874 (TIS-620 + C1-range additions).
 - macintosh -> x-MacRoman; x-mac-cyrillic -> x-MacCyrillic.
 - windows-1252 decodes via EncodingSniffer's own total table (the JDK
   charset leaves 5 bytes unmapped); "replacement" and "x-user-defined"
   never reach a JDK charset (spec: replacement decodes the whole stream
   to one U+FFFD; an x-user-defined meta declaration becomes windows-1252).
"""

# canonical name -> (labels, jdk charset name or None)
REGISTRY = {
    "UTF-8": (["unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8",
               "utf-8", "utf8", "x-unicode20utf8"], "UTF-8"),
    "IBM866": (["866", "cp866", "csibm866", "ibm866"], "IBM866"),
    "ISO-8859-2": (["csisolatin2", "iso-8859-2", "iso-ir-101", "iso8859-2",
                    "iso88592", "iso_8859-2", "iso_8859-2:1987", "l2",
                    "latin2"], "ISO-8859-2"),
    "ISO-8859-3": (["csisolatin3", "iso-8859-3", "iso-ir-109", "iso8859-3",
                    "iso88593", "iso_8859-3", "iso_8859-3:1988", "l3",
                    "latin3"], "ISO-8859-3"),
    "ISO-8859-4": (["csisolatin4", "iso-8859-4", "iso-ir-110", "iso8859-4",
                    "iso88594", "iso_8859-4", "iso_8859-4:1988", "l4",
                    "latin4"], "ISO-8859-4"),
    "ISO-8859-5": (["csisolatincyrillic", "cyrillic", "iso-8859-5",
                    "iso-ir-144", "iso8859-5", "iso88595", "iso_8859-5",
                    "iso_8859-5:1988"], "ISO-8859-5"),
    "ISO-8859-6": (["arabic", "asmo-708", "csiso88596e", "csiso88596i",
                    "csisolatinarabic", "ecma-114", "iso-8859-6",
                    "iso-8859-6-e", "iso-8859-6-i", "iso-ir-127",
                    "iso8859-6", "iso88596", "iso_8859-6",
                    "iso_8859-6:1987"], "ISO-8859-6"),
    "ISO-8859-7": (["csisolatingreek", "ecma-118", "elot_928", "greek",
                    "greek8", "iso-8859-7", "iso-ir-126", "iso8859-7",
                    "iso88597", "iso_8859-7", "iso_8859-7:1987",
                    "sun_eu_greek"], "ISO-8859-7"),
    "ISO-8859-8": (["csiso88598e", "csisolatinhebrew", "hebrew",
                    "iso-8859-8", "iso-8859-8-e", "iso-ir-138", "iso8859-8",
                    "iso88598", "iso_8859-8", "iso_8859-8:1988", "visual"],
                   "ISO-8859-8"),
    "ISO-8859-8-I": (["csiso88598i", "iso-8859-8-i", "logical"],
                     "ISO-8859-8"),  # same bytes; -I is display ordering
    "ISO-8859-10": (["csisolatin6", "iso-8859-10", "iso-ir-157",
                     "iso8859-10", "iso885910", "l6", "latin6"], None),
    "ISO-8859-13": (["iso-8859-13", "iso8859-13", "iso885913"],
                    "ISO-8859-13"),
    "ISO-8859-14": (["iso-8859-14", "iso8859-14", "iso885914"], None),
    "ISO-8859-15": (["csisolatin9", "iso-8859-15", "iso8859-15",
                     "iso885915", "iso_8859-15", "l9", "latin9"],
                    "ISO-8859-15"),
    "ISO-8859-16": (["iso-8859-16"], "ISO-8859-16"),
    "KOI8-R": (["cskoi8r", "koi", "koi8", "koi8-r", "koi8_r"], "KOI8-R"),
    "KOI8-U": (["koi8-ru", "koi8-u"], "KOI8-U"),
    "macintosh": (["csmacintosh", "mac", "macintosh", "x-mac-roman"],
                  "x-MacRoman"),
    "windows-874": (["dos-874", "iso-8859-11", "iso8859-11", "iso885911",
                     "tis-620", "windows-874"], "x-windows-874"),
    "windows-1250": (["cp1250", "windows-1250", "x-cp1250"], "windows-1250"),
    "windows-1251": (["cp1251", "windows-1251", "x-cp1251"], "windows-1251"),
    "windows-1252": (["ansi_x3.4-1968", "ascii", "cp1252", "cp819",
                      "csisolatin1", "ibm819", "iso-8859-1", "iso-ir-100",
                      "iso8859-1", "iso88591", "iso_8859-1",
                      "iso_8859-1:1987", "l1", "latin1", "us-ascii",
                      "windows-1252", "x-cp1252"], "windows-1252"),
    "windows-1253": (["cp1253", "windows-1253", "x-cp1253"], "windows-1253"),
    "windows-1254": (["cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148",
                      "iso8859-9", "iso88599", "iso_8859-9",
                      "iso_8859-9:1989", "l5", "latin5", "windows-1254",
                      "x-cp1254"], "windows-1254"),
    "windows-1255": (["cp1255", "windows-1255", "x-cp1255"], "windows-1255"),
    "windows-1256": (["cp1256", "windows-1256", "x-cp1256"], "windows-1256"),
    "windows-1257": (["cp1257", "windows-1257", "x-cp1257"], "windows-1257"),
    "windows-1258": (["cp1258", "windows-1258", "x-cp1258"], "windows-1258"),
    "x-mac-cyrillic": (["x-mac-cyrillic", "x-mac-ukrainian"],
                       "x-MacCyrillic"),
    "GBK": (["chinese", "csgb2312", "csiso58gb231280", "gb2312", "gb_2312",
             "gb_2312-80", "gbk", "iso-ir-58", "x-gbk"], "GBK"),
    "gb18030": (["gb18030"], "GB18030"),
    # JDK target is the HKSCS superset: the WHATWG big5 index includes the
    # HKSCS extension block, which plain JDK Big5 decodes to U+FFFD.
    # Residual delta vs the spec index: a handful of compatibility points
    # (e.g. duplicate-mapping preferences), vs wholesale data loss for all
    # HKSCS content under plain Big5.
    "Big5": (["big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5"],
             "Big5-HKSCS"),
    "EUC-JP": (["cseucpkdfmtjapanese", "euc-jp", "x-euc-jp"], "EUC-JP"),
    "ISO-2022-JP": (["csiso2022jp", "iso-2022-jp"], "ISO-2022-JP"),
    "Shift_JIS": (["csshiftjis", "ms932", "ms_kanji", "shift-jis",
                   "shift_jis", "sjis", "windows-31j", "x-sjis"],
                  "windows-31j"),
    "EUC-KR": (["cseuckr", "csksc56011987", "euc-kr", "iso-ir-149",
                "korean", "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601",
                "ksc_5601", "windows-949"], "x-windows-949"),
    "replacement": (["csiso2022kr", "hz-gb-2312", "iso-2022-cn",
                     "iso-2022-cn-ext", "iso-2022-kr", "replacement"],
                    None),
    "UTF-16BE": (["unicodefffe", "utf-16be"], "UTF-16BE"),
    "UTF-16LE": (["csunicode", "iso-10646-ucs-2", "ucs-2", "unicode",
                  "unicodefeff", "utf-16", "utf-16le"], "UTF-16LE"),
    "x-user-defined": (["x-user-defined"], None),
}

label_pairs = []
for name, (labels, _) in REGISTRY.items():
    for label in labels:
        label_pairs.append((label, name))
label_pairs.sort()
assert len(label_pairs) == len({l for l, _ in label_pairs}), "dup label"

jdk_pairs = [(n, j) for n, (_, j) in REGISTRY.items() if j is not None]

high = bytes(range(0xA0, 0x100))
def high_table(codec):
    s = high.decode(codec)
    assert len(s) == 96 and all(ord(c) < 0x10000 for c in s)
    return "".join(f"\\u{ord(c):04X}" for c in s)

def fmt_pairs(pairs, indent):
    lines, cur = [], ""
    for k, v in pairs:
        item = f'"{k}" -> "{v}", '
        if len(cur) + len(item) > 72:
            lines.append(cur.rstrip()); cur = ""
        cur += item
    if cur: lines.append(cur.rstrip())
    body = ("\n" + " " * indent).join(lines)
    return body.rstrip(",").rstrip(", ")

out = f"""package htmlspark.encoding

/** GENERATED by tools/gen_labels.py — do not edit by hand.
  *
  * The complete WHATWG encoding-label registry (transcribed from the
  * public https://encoding.spec.whatwg.org/encodings.json): every label
  * the spec recognizes, mapped to its canonical encoding name, plus the
  * canonical-name -> JDK charset table. The reference accepts any
  * runtime-supported label via InternalEncodingDeclaration (reference:
  * Core/Tokenizer.cs:2020-2035); this registry is the Spark engine's
  * equivalent surface. {len(label_pairs)} labels, {len(REGISTRY)} encodings.
  */
object EncodingLabels {{

  /** Lowercased WHATWG label -> canonical encoding name. */
  val labelToName: Map[String, String] = Map(
    {fmt_pairs(label_pairs, 4)})

  /** Canonical encoding name -> JDK charset name. Absent keys
    * (ISO-8859-10, ISO-8859-14: table-decoded below; replacement,
    * x-user-defined: never decoded via a JDK charset) are handled by
    * EncodingSniffer. */
  val nameToJdk: Map[String, String] = Map(
    {fmt_pairs(jdk_pairs, 4)})

  /** 0xA0-0xFF decode tables for the two registry encodings the JDK
    * lacks (bytes < 0xA0 are identity incl. C1, per the WHATWG
    * single-byte index); generated from the public ISO-8859-10/-14
    * mappings (Python stdlib codecs). */
  val Iso885910High: String =
    "{high_table('iso8859_10')}"
  val Iso885914High: String =
    "{high_table('iso8859_14')}"
}}
"""

with open("src/main/scala/htmlspark/encoding/EncodingLabels.scala", "w") as f:
    f.write(out)
print(f"wrote {len(label_pairs)} labels / {len(REGISTRY)} encodings")
