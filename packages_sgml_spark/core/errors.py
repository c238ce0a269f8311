"""Parser error ("gripe") machinery.

Message texts and severities mirror the reference's gripe() /
format_message() (/root/reference/parser.c:5531-5870) so that the
(line, message) pairs compare equal to the golden `.ok` error lists
(compare rule: /root/reference/test_sgml.pl:153-156).
"""

from dataclasses import dataclass

# severities
STYLE = "informational"
WARNING = "warning"
ERROR = "error"


@dataclass
class ParseError:
    severity: str
    line: int
    message: str

    def as_tuple(self):
        return (self.line, self.message)


def str_summary(s: str, maxlen: int = 25) -> str:
    """reference util str_summary: truncate with ... marker."""
    if s is None:
        return ""
    s = s.replace('\n', ' ').replace('\r', '')
    if len(s) <= maxlen:
        return s
    return s[: maxlen - 8] + "..." + s[-5:]


class Gripes:
    """Factory for error records with reference-identical messages."""

    @staticmethod
    def syntax_error(msg, found=""):
        if found:
            return (ERROR, '%s, found "%s"' % (msg, str_summary(found)))
        return (ERROR, msg)

    @staticmethod
    def syntax_warning(msg, found=""):
        if found:
            return (WARNING, '%s, found "%s"' % (msg, str_summary(found)))
        return (WARNING, msg)

    @staticmethod
    def existence(kind, name):
        return (ERROR, '%s "%s" does not exist' % (kind, name))

    @staticmethod
    def redefined(kind, name):
        return (STYLE, 'Redefined %s "%s"' % (kind, name))

    @staticmethod
    def validate(msg):
        return (WARNING, msg)

    @staticmethod
    def omitted_close(element):
        return (WARNING, 'Inserted omitted end-tag for "%s"' % element)

    @staticmethod
    def omitted_open(element):
        return (WARNING, 'Inserted omitted start-tag for "%s"' % element)

    @staticmethod
    def not_open(element):
        return (WARNING, 'Ignored end-tag for "%s" which is not open' % element)

    @staticmethod
    def not_allowed(element):
        return (WARNING, 'Element "%s" not allowed here' % element)

    @staticmethod
    def no_attribute(element, attr):
        # reference parser.c:5712-5721 (ERC_NO_ATTRIBUTE)
        return (WARNING, 'Element "%s" has no attribute "%s"' % (element, attr))

    @staticmethod
    def no_attribute_value(element, value):
        return (WARNING,
                'Element "%s" has no attribute with value "%s"' % (element, value))

    @staticmethod
    def no_value(entity):
        # ERC_NO_VALUE routes through ERC_EXISTENCE (parser.c:5740-5747)
        return (ERROR, 'entity value "%s" does not exist' % entity)

    @staticmethod
    def not_allowed_pcdata(cdata):
        return (WARNING, '#PCDATA ("%s") not allowed here' % str_summary(cdata))

    @staticmethod
    def et_system(file):
        return (WARNING,
                "SYSTEM entity %s not allowed.  Use system_entities(true)" % file)

    @staticmethod
    def no_doctype(doctype, file):
        return (WARNING,
                'No <!DOCTYPE ...>, assuming "%s" from DTD file "%s"'
                % (doctype, file))

    @staticmethod
    def representation(what):
        return (ERROR, "Cannot represent due to %s" % what)

    @staticmethod
    def resource(what):
        return (ERROR, "Insufficient %s resources" % what)
