"""Chat templating.

Minimal registry with the templates V2PE actually uses (the reference
vendors ~40 fastchat templates in conversation.py; only ``internlm2-chat``
is exercised by the 2B flows and ``internvl2_5`` by the 8B fork). Prompt
strings match ``internvl/conversation.py:743-755`` (MPT separator style,
``:239-248``) exactly."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple


@dataclasses.dataclass
class Conversation:
    name: str
    system_template: str
    system_message: str
    roles: Tuple[str, str]
    sep: str
    stop_token_ids: Tuple[int, ...] = ()
    stop_str: Optional[str] = None
    messages: List[Tuple[str, Optional[str]]] = dataclasses.field(
        default_factory=list)

    @property
    def system_prompt(self) -> str:
        return self.system_template.format(system_message=self.system_message)

    def append_message(self, role: str, message: Optional[str]):
        self.messages.append((role, message))

    def get_prompt(self) -> str:
        """MPT separator style (conversation.py:239-248)."""
        ret = self.system_prompt + self.sep
        for role, message in self.messages:
            if message:
                ret += role + message + self.sep
            else:
                ret += role
        return ret

    def copy(self) -> "Conversation":
        return Conversation(
            name=self.name, system_template=self.system_template,
            system_message=self.system_message, roles=self.roles,
            sep=self.sep, stop_token_ids=self.stop_token_ids,
            stop_str=self.stop_str, messages=list(self.messages))


_REGISTRY = {}


def register_conv_template(conv: Conversation):
    _REGISTRY[conv.name] = conv


def get_conv_template(name: str) -> Conversation:
    return _REGISTRY[name].copy()


register_conv_template(Conversation(
    name="internlm2-chat",
    system_template="<|im_start|>system\n{system_message}",
    system_message=(
        "你是由上海人工智能实验室联合商汤科技开发的书生多模态大模型，英文名叫InternVL, "
        "是一个有用无害的人工智能助手。"),
    roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
    sep="<|im_end|>",
    stop_token_ids=(2, 1163, 92543, 92542),
))

# InternVL2.5 template (internvl2_5/conversation.py:1324-1333): same MPT
# structure, updated system message, sep includes the trailing newline, and
# no explicit stop_token_ids (generation falls back to the model eos).
register_conv_template(Conversation(
    name="internvl2_5",
    system_template="<|im_start|>system\n{system_message}",
    system_message=(
        "你是书生·万象，英文名是InternVL，是由上海人工智能实验室、清华大学及多家合作单位"
        "联合开发的多模态大语言模型。"),
    roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
    sep="<|im_end|>\n",
    stop_token_ids=(),
))
