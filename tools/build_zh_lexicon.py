"""Build a real-size hanzi→pinyin lexicon from public Unicode CLDR data.

The image has no pypinyin (the reference's zh G2P dict,
``NeuralSeq/data_gen/tts/txt_processors/zh.py:3``), but perl ships the
Unicode CLDR han collation tables:

  * ``Unicode/Collate/CJK/Pinyin.pm`` — 20,893 hanzi grouped by (pinyin
    syllable, tone), groups sorted alphabetically within 23 initial-letter
    blocks (``FDD0-00XX`` markers); groups wrap at 10 chars per physical
    line, so a 10-char line MAY continue on the next line. Each char
    appears exactly once, at its CLDR-primary reading. The syllable strings
    themselves are NOT in the file — only the grouping and order.
  * ``Unicode/Collate/CJK/Zhuyin.pm`` — the same chars grouped into 36
    blocks keyed by the FIRST bopomofo symbol of the reading (``FDD0-31XX``)
    — an independent source for each char's initial.

Labeling pipeline (all checks are mechanical, no reference data touched):
  0. group: merge a 10-char line with its successor unless seed votes say
     they are different groups (the wrap-at-10 convention above);
  1. vote: a curated seed dict (char → syllable+tone, high-confidence
     single-reading chars) labels each group by strict-majority vote;
  2. order: labeled groups within a block must be strictly increasing in
     (syllable, tone-1..5) collation order — violators are dropped via a
     longest-increasing-subsequence filter (ü-syllables exempt: their
     CLDR secondary-weight position differs from ASCII 'v' order);
  3. zhuyin: a group's labeled syllable implies one bopomofo first-symbol;
     groups where <70% of cross-checkable chars agree are dropped, and
     individually disagreeing chars (polyphones whose two CLDR tables pick
     different primaries) are dropped;
  4. interpolate: an unlabeled run flanked by same-syllable labels with an
     exactly-matching tone gap gets the missing tones;
  5. emit ``audiogpt_tpu/text/zh_lexicon.tsv`` (char<TAB>syllable+tone),
     curated OVERRIDES (context-free defaults for common polyphones) last.

Run:  python tools/build_zh_lexicon.py
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

PINYIN_PM = "/usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm"
ZHUYIN_PM = "/usr/share/perl/5.36.0/Unicode/Collate/CJK/Zhuyin.pm"
OUT = os.path.join(os.path.dirname(__file__), "..", "audiogpt_tpu", "text",
                   "zh_lexicon.tsv")

# ---------------------------------------------------------------------------
# Seed readings (model-curated, single-reading chars only; format:
# "syllable+tone chars"). Chars with >1 common reading belong in OVERRIDES,
# not here — a seed voting from the "wrong" line poisons that line's label.
# ---------------------------------------------------------------------------

_SEED_DATA = """
a1 阿
ai1 哎哀埃
ai2 挨癌
ai3 矮
ai4 爱碍艾
an1 安氨鞍庵
an4 按案暗岸
ang2 昂
ao2 熬翱
ao3 袄
ao4 傲奥澳懊
ba1 八巴芭疤捌叭
ba2 拔跋
ba3 把靶
ba4 爸罢霸坝
ba5 吧
bai1 掰
bai2 白
bai3 百摆佰
bai4 败拜
ban1 班般搬斑颁扳
ban3 板版
ban4 办半伴拌扮瓣
bang1 帮邦
bang3 绑榜膀
bang4 棒傍镑磅谤
bao1 包胞苞褒
bao2 雹
bao3 宝饱保堡
bao4 报抱暴爆豹鲍
bei1 杯悲卑碑
bei3 北
bei4 贝备被倍辈惫悖
ben1 奔
ben3 本
ben4 笨
beng1 崩绷
beng4 蹦迸
bi1 逼
bi2 鼻
bi3 比笔彼鄙
bi4 必毕闭壁避弊币碧蔽毙痹臂
bian1 边编鞭蝙
bian3 扁贬
bian4 变便遍辩辨辫
biao1 标彪膘
biao3 表
bie1 憋鳖
bie2 别
bin1 宾滨缤
bing1 冰兵
bing3 丙柄饼秉
bing4 并病
bo1 波玻拨播菠钵
bo2 博伯脖舶渤驳
bo3 跛
bu3 补捕哺
bu4 不布步部怖簿埠
ca1 擦
cai1 猜
cai2 才材财裁
cai3 采彩睬踩
cai4 菜蔡
can1 参餐
can2 残蚕惭
can3 惨
can4 灿
cang1 仓苍舱沧
cang2 藏
cao1 操糙
cao2 曹槽
cao3 草
ce4 册侧厕测策
cha2 查茶察搽
cha4 岔诧
chai1 拆
chai2 柴豺
chan1 搀
chan2 馋缠蝉禅
chan3 产铲阐
chan4 颤
chang1 昌猖
chang2 常尝肠偿
chang3 场厂敞
chang4 唱畅倡
chao1 抄超钞
chao2 潮巢嘲
chao3 吵炒
che1 车
che3 扯
che4 彻撤澈
chen2 尘辰沉陈晨忱
chen4 衬趁
cheng1 撑
cheng2 成城诚承乘程惩橙呈
cheng3 逞
cheng4 秤
chi1 吃痴嗤
chi2 池迟持驰
chi3 尺耻齿侈
chi4 斥赤翅炽
chong1 充冲憧
chong2 虫崇
chong3 宠
chou1 抽
chou2 仇绸愁稠筹酬畴
chou3 丑
chou4 臭
chu1 出初
chu2 除厨锄雏橱
chu3 楚础储
chuan1 川穿
chuan2 船
chuan3 喘
chuan4 串
chuang1 窗疮
chuang2 床
chuang3 闯
chuang4 创
chui1 吹炊
chui2 垂锤捶
chun1 春
chun2 纯唇醇
chun3 蠢
ci2 词瓷慈磁辞雌
ci3 此
ci4 次刺赐
cong1 聪葱匆
cong2 从丛
cou4 凑
cu1 粗
cu4 促醋簇
cuan4 窜篡
cui1 催摧崔
cui4 脆翠粹
cun1 村
cun2 存
cun4 寸
cuo1 搓磋撮
cuo4 错挫措
da2 达
da3 打
da4 大
dai1 呆
dai4 代带待戴袋贷逮怠
dan1 单耽丹
dan3 胆
dan4 但淡蛋氮旦诞
dang1 当铛
dang3 党挡
dang4 荡档
dao1 刀叨
dao3 导岛蹈捣
dao4 到道盗稻悼
de2 德
deng1 灯登蹬
deng3 等
deng4 凳邓瞪
di1 低滴堤
di2 敌笛涤嘀
di3 底抵
di4 地第弟帝递缔
dian1 颠掂
dian3 点典
dian4 电店殿垫淀惦奠
diao1 刁叼雕
diao4 掉钓吊
die1 爹跌
die2 叠碟蝶谍
ding1 丁叮盯钉
ding3 顶鼎
ding4 定订
diu1 丢
dong1 东冬
dong3 董懂
dong4 动冻洞栋
dou1 兜
dou4 豆逗痘
du1 督嘟
du2 读毒独
du3 堵赌睹
du4 度渡肚妒杜镀
duan1 端
duan3 短
duan4 段断锻缎
dui1 堆
dui4 对队兑
dun1 吨蹲敦墩
dun4 顿盾钝炖
duo1 多哆
duo2 夺
duo3 朵躲
duo4 舵堕惰跺
e2 鹅蛾额俄讹娥
e4 恶饿扼遏鄂噩鳄
en1 恩
er2 而儿
er3 耳尔饵
er4 二贰
fa1 发
fa2 罚乏伐阀筏
fa3 法
fan1 翻帆番藩
fan2 凡烦繁樊
fan3 反返
fan4 饭犯泛范贩梵
fang1 方芳
fang2 房防妨肪
fang3 访仿纺
fang4 放
fei1 飞非啡菲妃
fei2 肥
fei3 匪诽
fei4 费废肺沸吠
fen1 分纷芬吩氛
fen2 坟焚
fen3 粉
fen4 份奋愤粪忿
feng1 风封丰峰蜂疯枫锋
feng2 逢
feng3 讽
feng4 凤奉
fo2 佛
fou3 否
fu1 夫肤敷孵
fu2 福浮扶符幅伏服俘拂袱
fu3 府腐辅抚斧俯脯
fu4 父负付附富妇复赴副覆傅缚腹
gai1 该
gai3 改
gai4 盖概钙溉
gan1 干甘肝杆竿
gan3 感敢赶秆橄
gang1 刚钢纲缸肛
gang3 港岗
gang4 杠
gao1 高糕膏篙羔
gao3 搞稿
gao4 告
ge1 哥歌割胳搁鸽疙戈
ge2 格革隔阁膈
ge4 个各
gei3 给
gen1 根跟
geng1 耕羹
geng3 埂耿梗
gong1 工公功攻宫弓恭躬供
gong3 巩汞拱
gong4 共贡
gou1 沟钩
gou3 狗苟
gou4 够购构垢
gu1 姑孤估辜菇咕沽
gu3 古谷股骨鼓蛊
gu4 故顾固雇
gua1 瓜刮
gua3 寡
gua4 挂褂卦
guai1 乖
guai3 拐
guai4 怪
guan1 关观官冠棺
guan3 管馆
guan4 惯灌罐贯
guang1 光
guang3 广
guang4 逛
gui1 归规硅龟闺瑰
gui3 鬼轨诡
gui4 贵桂柜跪刽
gun4 棍
guo1 锅郭
guo2 国
guo3 果裹
guo4 过
ha1 哈
hai2 孩
hai3 海
hai4 害骇氦亥
han1 憨鼾
han2 含寒韩涵函
han3 喊罕
han4 汉汗旱悍捍焊憾撼翰
hang2 航杭
hao2 豪毫嚎壕
hao3 好
hao4 号耗浩皓
he1 喝
he2 何河合盒荷核禾阂
he4 贺赫鹤
hei1 黑嘿
hen2 痕
hen3 很狠
hen4 恨
heng1 哼
heng2 横恒衡
hong1 轰烘
hong2 红洪虹宏鸿
hou2 喉猴
hou3 吼
hou4 后厚候
hu1 呼忽乎
hu2 湖胡壶糊蝴狐弧葫
hu3 虎唬
hu4 户互护沪
hua1 花
hua2 华滑
hua4 化画话桦
huai2 怀淮徊槐
huai4 坏
huan1 欢
huan3 缓
huan4 换唤患幻焕痪宦
huang1 荒慌
huang2 黄皇煌蝗凰惶
huang3 谎恍
hui1 灰挥辉徽恢
hui2 回茴
hui3 悔毁
hui4 会惠汇绘贿讳诲晦秽
hun1 婚昏荤
hun2 浑魂馄
hun4 混
huo2 活
huo3 火伙
huo4 或货获祸惑霍
ji1 机鸡基击积饥肌讥圾矶稽畸激姬
ji2 极及级即急集辑籍吉疾嫉
ji3 己挤脊戟
ji4 记计济技际纪继寄既忌剂悸季祭绩寂迹冀妓
jia1 家加佳嘉
jia2 颊
jia3 甲假贾钾
jia4 价架驾嫁稼
jian1 间尖肩坚奸歼煎兼监艰
jian3 检减剪简捡拣俭碱茧
jian4 见件建健剑荐舰践鉴键箭渐溅谏
jiang1 江姜僵疆浆
jiang3 讲奖桨蒋
jiang4 酱匠
jiao1 交郊浇娇骄胶焦蕉椒礁
jiao3 脚搅饺缴绞狡矫
jiao4 叫较轿酵窖
jie1 接街阶皆揭嗟
jie2 节结洁杰捷截竭劫睫
jie3 姐解
jie4 界借介戒届诫芥
jin1 今金斤巾筋津襟
jin3 仅紧谨锦
jin4 近进浸晋
jing1 京经精惊晶睛菁茎兢
jing3 井景警颈
jing4 净静境镜竟竞敬径靖
jiu1 究纠揪
jiu3 九久酒韭
jiu4 就旧救舅咎疚
ju1 居拘鞠驹
ju2 局菊橘
ju3 举矩咀沮
ju4 句具据巨距惧聚剧锯拒俱炬
juan1 捐娟鹃
juan3 卷
juan4 倦眷绢
jue2 决觉绝掘爵诀
jun1 军君均菌
jun4 俊峻竣骏
ka1 咖喀
ka3 卡
kai1 开揩
kai3 凯慨楷
kan1 刊堪勘
kan3 砍坎侃
kan4 看瞰
kang1 康慷糠
kang2 扛
kang4 抗炕亢
kao3 考烤拷
kao4 靠
ke1 科颗棵柯苛磕蝌
ke2 壳咳
ke3 可渴坷
ke4 克刻客课
ken3 肯恳啃垦
keng1 坑
kong1 空
kong3 孔恐
kong4 控
kou1 抠
kou3 口
kou4 扣寇
ku1 哭枯窟
ku3 苦
ku4 库裤酷
kua1 夸
kua4 跨挎胯
kuai4 快块筷脍
kuan1 宽
kuan3 款
kuang1 筐匡
kuang2 狂
kuang4 况矿框旷眶
kui1 亏窥盔
kui2 葵魁
kui4 愧溃馈
kun1 昆坤
kun4 困
kuo4 扩阔括廓
la1 拉啦垃
la4 辣蜡腊
lai2 来莱
lai4 赖
lan2 蓝兰拦栏篮婪澜
lan3 览懒揽缆
lan4 烂滥
lang2 狼郎廊榔
lang3 朗
lang4 浪
lao1 捞
lao2 劳牢
lao3 老佬姥
lao4 涝烙
lei2 雷擂
lei3 垒蕾磊
lei4 类泪肋
leng2 棱
leng3 冷
leng4 愣
li2 离梨犁黎篱璃狸厘漓
li3 里理李礼鲤俚
li4 力立利历厉励例丽隶栗吏沥莉痢
lian2 连莲联廉帘镰怜涟
lian3 脸敛
lian4 练炼恋链
liang2 良梁粮粱
liang3 两
liang4 亮辆谅晾
liao2 辽疗聊僚寥缭
liao4 料廖
lie4 列烈裂劣猎
lin2 林临邻鳞淋磷琳霖
lin4 吝赁
ling2 零铃灵龄玲凌陵菱翎
ling3 领岭
ling4 另令
liu1 溜
liu2 流留刘榴瘤硫琉
liu3 柳
liu4 六遛
long2 龙聋隆胧珑
lou2 楼
lou4 漏陋
lu2 炉芦庐卢颅
lu3 鲁卤虏
lu4 路录鹿陆碌赂戮麓
lv2 驴
lv3 旅吕铝屡缕履侣
lv4 绿虑滤氯
luan3 卵
luan4 乱
lve4 略掠
lun2 轮伦沦仑
lun4 论
luo2 罗萝锣箩骡螺逻
luo4 落络骆洛
ma1 妈
ma2 麻蟆
ma3 马码蚂玛
ma4 骂
ma5 吗嘛
mai2 埋
mai3 买
mai4 卖麦脉迈
man2 蛮馒瞒
man3 满
man4 慢漫曼蔓幔
mang2 忙盲茫芒
mao1 猫
mao2 毛矛茅锚
mao4 冒帽貌贸茂
mei2 没煤梅媒玫眉莓霉
mei3 美每镁
mei4 妹媚昧魅
men2 门
meng2 蒙萌盟檬
meng3 猛蟒锰
meng4 梦孟
mi1 眯
mi2 迷谜弥
mi3 米
mi4 密秘蜜觅泌
mian2 棉眠绵
mian3 免勉缅娩
mian4 面
miao2 苗描瞄
miao3 秒渺藐
miao4 妙庙
mie4 灭蔑
min2 民
min3 敏悯闽皿
ming2 明名鸣铭螟
ming4 命
miu4 谬
mo1 摸
mo2 膜魔摩蘑
mo4 末沫莫墨默漠陌寞
mou2 谋眸牟
mou3 某
mu3 母亩姆拇牡
mu4 木目牧墓幕慕募睦穆
na2 拿
na3 哪
na4 那纳钠
nai3 乃奶
nai4 耐奈
nan2 南男喃
nang2 囊
nao3 脑恼
nao4 闹
nei4 内
nen4 嫩
neng2 能
ni2 泥尼妮霓
ni3 你拟
ni4 逆腻匿溺
nian2 年黏
nian3 捻碾
nian4 念
niang2 娘
niang4 酿
niao3 鸟
niao4 尿
nie1 捏
nie4 聂孽镊
nin2 您
ning2 凝柠狞
niu2 牛
niu3 扭纽钮
nong2 农浓脓
nong4 弄
nu2 奴
nu3 努
nu4 怒
nv3 女
nve4 虐
nuan3 暖
nuo2 挪
nuo4 诺懦糯
ou1 欧鸥殴
ou3 偶藕呕
pa1 趴啪
pa2 爬
pa4 怕帕
pai1 拍
pai2 排牌徘
pai4 派
pan1 攀潘
pan2 盘蟠
pan4 判盼叛畔
pang2 旁庞螃
pang4 胖
pao1 抛
pao2 袍
pao3 跑
pao4 炮泡
pei2 陪培赔
pei4 配佩沛
pen1 喷
pen2 盆
peng1 烹砰
peng2 朋棚蓬膨彭鹏篷
peng3 捧
peng4 碰
pi1 批披霹坯
pi2 皮疲脾啤琵
pi3 匹痞
pi4 屁僻譬
pian1 篇偏翩
pian4 片骗
piao1 飘
piao4 票
pin1 拼
pin2 贫频
pin3 品
pin4 聘
ping1 乒
ping2 平瓶评凭萍屏苹坪
po1 坡泼颇
po2 婆
po4 破迫魄粕
pou1 剖
pu1 扑
pu2 葡菩蒲
pu3 普谱朴浦圃
pu4 瀑曝
qi1 七期欺漆妻戚凄沏
qi2 其奇齐骑旗棋祈歧崎
qi3 起企岂启乞
qi4 气器汽弃泣砌迄
qia1 掐
qia4 恰洽
qian1 千牵签铅谦迁钎
qian2 钱前潜钳乾黔
qian3 浅遣谴
qian4 欠歉嵌
qiang1 枪腔羌
qiang2 墙
qiang3 抢
qiao1 敲锹
qiao2 桥瞧乔侨憔
qiao3 巧
qiao4 俏峭窍撬翘
qie2 茄
qie3 且
qie4 窃怯
qin1 亲侵钦
qin2 琴勤秦禽芹擒
qing1 青清轻倾卿蜻氢
qing2 情晴擎
qing3 请顷
qing4 庆
qiong2 穷琼
qiu1 秋丘邱蚯
qiu2 求球囚酋
qu1 区驱屈躯趋
qu2 渠
qu3 取娶
qu4 去趣
quan1 圈
quan2 全权泉拳痊诠
quan3 犬
quan4 劝券
que1 缺
que2 瘸
que4 却确雀鹊
qun2 群裙
ran2 然燃
ran3 染
rang3 嚷壤攘
rang4 让
rao2 饶
rao3 扰
rao4 绕
re3 惹
re4 热
ren2 人仁
ren3 忍
ren4 认任刃韧纫妊
reng1 扔
reng2 仍
ri4 日
rong2 容荣融绒溶熔蓉
rou2 柔揉
rou4 肉
ru2 如儒蠕茹
ru3 乳辱汝
ru4 入褥
ruan3 软
rui4 锐瑞
run4 润闰
ruo4 若弱
sa3 洒
sa4 萨飒
sai1 腮鳃
sai4 赛
san1 三叁
san3 伞
san4 散
sang1 桑
sang3 嗓
sao1 骚搔
sao3 嫂
se4 色涩瑟
sen1 森
seng1 僧
sha1 沙杀纱砂鲨
sha3 傻
sha4 霎
shai1 筛
shai4 晒
shan1 山衫删珊煽
shan3 闪陕
shan4 善扇擅膳赡
shang1 伤商
shang3 赏晌
shang4 上尚
shao1 烧稍捎梢
shao2 勺
shao3 少
shao4 绍哨邵
she1 奢赊
she2 舌蛇
she4 社射设摄涉赦
shen1 身深申伸绅呻
shen2 什神
shen3 审婶沈
shen4 甚肾慎渗
sheng1 生声升牲甥
sheng2 绳
sheng3 省
sheng4 胜圣盛剩
shi1 师失诗施湿狮尸
shi2 十时实识石食拾蚀
shi3 使史始驶屎矢
shi4 是事市式士世视试势室示饰释誓逝氏侍嗜
shou1 收
shou3 手首守
shou4 受授售兽瘦寿
shu1 书输舒叔殊梳疏蔬枢淑
shu2 熟赎
shu3 属鼠暑署薯蜀
shu4 术树束述竖恕墅
shua1 刷
shua3 耍
shuai1 衰摔
shuai4 帅
shuan1 拴栓
shuang1 双霜
shui3 水
shui4 睡税
shun4 顺瞬
shuo1 说
shuo4 硕烁
si1 思私司丝斯撕嘶厮
si3 死
si4 四似寺饲肆伺
song1 松
song3 耸
song4 送宋颂诵讼
sou1 搜艘
su1 苏酥
su2 俗
su4 速素诉宿肃塑溯
suan1 酸
suan4 算蒜
sui1 虽
sui2 随隋
sui4 岁碎遂隧穗
sun1 孙
sun3 损笋
suo1 缩梭唆嗦
suo3 所索锁琐
ta1 他她它塌
ta3 塔
ta4 榻
tai2 台抬苔
tai4 太态泰汰
tan1 贪摊滩瘫
tan2 谈坛痰潭檀
tan3 坦毯忐
tan4 叹炭探碳
tang1 汤
tang2 堂糖唐塘膛
tang3 躺倘淌
tang4 烫趟
tao1 掏涛滔
tao2 逃桃陶淘萄
tao3 讨
tao4 套
te4 特
teng2 疼腾藤誊
ti1 踢梯剔
ti2 提题蹄啼
ti3 体
ti4 替剃涕惕屉
tian1 天添
tian2 田甜填
tian3 舔
tiao4 跳眺
tie1 贴
tie3 铁
ting1 听厅
ting2 停庭亭廷蜓
ting3 挺艇
tong1 通
tong2 同铜童桐瞳彤
tong3 统桶筒捅
tong4 痛
tou1 偷
tou2 头投
tou4 透
tu1 突凸秃
tu2 图途徒涂屠
tu4 兔
tuan2 团
tui1 推
tui3 腿
tui4 退褪
tun1 吞
tun2 屯臀
tuo1 托拖脱
tuo2 驼陀
tuo3 妥椭
tuo4 唾
wa1 挖蛙洼
wa3 瓦
wa4 袜
wai1 歪
wai4 外
wan1 弯湾豌蜿
wan2 完玩丸顽
wan3 晚碗挽惋婉
wan4 万腕
wang1 汪
wang2 王亡
wang3 往网枉惘
wang4 忘望旺妄
wei1 威微危巍偎
wei2 围维违桅
wei3 伟委伪尾纬萎痿猥
wei4 位未味卫谓喂慰胃魏畏蔚
wen1 温瘟
wen2 文闻纹蚊
wen3 稳吻紊
wen4 问
weng1 翁嗡
wo1 窝蜗
wo3 我
wo4 卧握沃
wu1 屋乌污巫呜诬钨
wu2 无吴梧蜈
wu3 五午武舞伍侮捂
wu4 物务误悟雾勿坞
xi1 西希吸息悉惜析稀溪锡牺晰硒熙嘻膝夕昔
xi2 习席袭媳
xi3 洗喜
xi4 细戏隙
xia1 虾瞎
xia2 霞峡狭侠辖暇
xia4 下夏吓
xian1 先仙掀
xian2 闲嫌咸贤弦衔涎
xian3 显险
xian4 现县线限献宪陷馅羡腺
xiang1 相香乡箱厢湘镶襄
xiang2 详祥翔
xiang3 想响享
xiang4 向象项像橡巷
xiao1 消销萧宵硝潇
xiao3 小晓
xiao4 笑校效肖孝
xie1 些歇蝎楔
xie2 鞋协斜邪胁谐携
xie3 写
xie4 谢泄泻卸屑械懈蟹
xin1 心新辛欣薪馨锌芯
xin4 信
xing1 星腥猩
xing2 形型刑邢
xing3 醒
xing4 姓幸性杏
xiong1 兄胸凶汹匈
xiong2 雄熊
xiu1 修休羞
xiu4 秀袖绣嗅锈
xu1 需须虚嘘墟
xu2 徐
xu3 许栩
xu4 续序绪叙蓄酗旭絮婿
xuan1 宣喧轩
xuan2 悬玄
xuan3 选
xuan4 炫绚眩
xue2 学穴
xue3 雪
xue4 血
xun1 熏勋
xun2 寻巡询循旬
xun4 迅训讯逊殉驯汛
ya1 压鸦鸭押
ya2 牙芽崖涯蚜
ya3 哑雅
ya4 亚讶
yan1 烟淹腌胭
yan2 言严沿炎研盐颜阎延岩蜒檐
yan3 眼演掩衍
yan4 验厌宴艳焰雁唁彦谚
yang1 央秧殃
yang2 阳羊洋杨扬
yang3 养仰氧痒
yang4 样漾
yao1 腰邀妖夭吆
yao2 摇遥窑谣姚尧
yao3 咬
yao4 药耀
ye1 椰噎
ye2 爷
ye3 也野冶
ye4 夜业叶页液腋
yi1 一衣医依伊壹
yi2 宜移姨遗疑仪夷胰
yi3 以已乙蚁倚椅
yi4 意义议亿艺易亦异役译益谊毅翼逸疫溢
yin1 因音阴姻茵
yin2 银吟寅淫
yin3 引饮隐瘾
yin4 印
ying1 英应樱鹰婴莺缨
ying2 迎营赢盈蝇萤荧莹
ying3 影颖
ying4 硬映
yong1 拥庸雍臃
yong3 永勇泳涌踊咏
yong4 用
you1 优忧悠幽
you2 由油游邮尤犹铀鱿
you3 有友
you4 又右幼诱釉
yu1 迂淤
yu2 于余鱼渔娱愚榆舆逾愉
yu3 与雨语羽宇屿禹
yu4 玉育欲狱遇豫御裕誉预寓愈浴郁
yuan1 冤鸳渊
yuan2 元原员圆园源缘袁猿援
yuan3 远
yuan4 院愿怨苑
yue1 约曰
yue4 月越跃悦阅岳粤
yun2 云匀芸耘
yun3 允陨
yun4 运韵孕酝蕴
za2 杂砸
zai1 灾栽哉
zai4 再在
zan2 咱
zan4 赞暂
zang1 赃
zang4 葬
zao1 遭糟
zao2 凿
zao3 早枣澡藻
zao4 造燥灶噪皂躁
ze2 则责择泽
zei2 贼
zen3 怎
zeng1 增憎
zeng4 赠
zha1 渣喳
zha4 诈榨乍
zhai1 摘斋
zhai2 宅
zhai3 窄
zhai4 债寨
zhan1 沾瞻毡
zhan3 展斩崭盏辗
zhan4 战站栈绽蘸
zhang1 章彰樟蟑
zhang4 丈帐胀账杖障仗
zhao4 照罩兆赵召
zhe1 遮
zhe2 哲辙
zhe4 浙蔗
zhen1 真针珍侦贞斟榛砧臻
zhen3 诊枕疹
zhen4 阵镇震振赈
zheng1 征蒸睁筝铮峥
zheng3 整拯
zheng4 证症郑怔
zhi1 之支枝知织脂汁芝肢吱蜘
zhi2 直值职植殖执侄
zhi3 止指纸址趾旨咫
zhi4 至制治致志质秩智置滞稚挚掷窒炙痔
zhong1 终钟忠衷
zhong3 肿
zhong4 众仲
zhou1 州周舟洲粥
zhou2 轴
zhou4 皱宙昼骤咒
zhu1 朱珠株猪诸蛛
zhu2 竹逐烛竺
zhu3 主煮嘱瞩拄
zhu4 住注助驻柱筑铸祝贮
zhua1 抓
zhuai4 拽
zhuan1 专砖
zhuan4 赚撰
zhuang1 装庄桩妆
zhuang4 壮状撞
zhui1 追锥
zhui4 坠缀赘
zhun3 准
zhuo1 桌捉拙
zhuo2 卓灼浊酌啄琢
zi1 资姿滋咨兹
zi3 紫籽梓
zi4 自
zong1 宗综棕踪鬃
zong3 总
zong4 纵粽
zou3 走
zou4 奏揍
zu1 租
zu2 足卒
zu3 组阻祖
zui3 嘴
zui4 罪醉
zun1 尊遵
zuo2 昨
zuo3 左
zuo4 做坐座佐
an3 俺铵埯
ang1 肮
ang4 盎
ao1 凹
bu1 逋晡
can4 粲璨
cen2 岑涔
ceng2 层
ceng4 蹭
cha1 叉插
chen1 郴琛嗔
chen3 碜
cheng1 柽蛏
chong4 铳
chu4 怵绌
chuo4 绰辍
ci1 疵
cu2 徂殂
cui3 璀
cun3 忖
cuo2 嵯痤矬
da1 搭耷哒褡
dia3 嗲
die2 迭垤
dou3 抖陡蚪
dun3 盹趸
duo3 垛哚
duo4 剁
e1 婀屙
en4 摁
fa4 珐
fu2 弗凫孚
ga1 旮嘎
ga2 噶
ga3 尕
ga4 尬
luan2 峦孪挛滦
nang1 囔
tuan1 湍
tiao3 窕
wei4 猬
"""

# Context-free default readings for common polyphones (what the reference's
# per-char pypinyin call yields for isolated text) — NOT used for voting,
# applied as final overrides. Includes the round-1 builtin lexicon.
_OVERRIDES = """
的 de5
了 le5
着 zhe5
们 men2
么 me5
呢 ne5
吗 ma5
啊 a1
得 de2
地 di4
不 bu4
是 shi4
和 he2
很 hen3
还 hai2
都 dou1
为 wei4
行 xing2
长 chang2
重 zhong4
只 zhi3
发 fa1
干 gan1
便 bian4
乐 yue4
子 zi3
数 shu4
量 liang4
曾 ceng2
调 tiao2
传 chuan2
差 cha4
处 chu4
切 qie1
答 da2
倒 dao3
斗 dou4
度 du4
觉 jue2
教 jiao4
几 ji3
间 jian1
将 jiang1
降 jiang4
尽 jin4
卷 juan3
看 kan4
空 kong1
难 nan2
宁 ning2
朴 pu3
漂 piao4
强 qiang2
曲 qu3
散 san4
扫 sao3
舍 she4
省 sheng3
似 si4
提 ti2
挑 tiao1
吐 tu3
系 xi4
相 xiang1
兴 xing4
血 xue4
要 yao4
应 ying1
载 zai4
涨 zhang3
正 zheng4
中 zhong1
种 zhong3
转 zhuan3
作 zuo4
与 yu3
内 nei4
弹 tan2
别 bie2
从 cong2
当 dang1
打 da3
大 da4
给 gei3
更 geng4
会 hui4
结 jie2
没 mei2
那 na4
任 ren4
上 shang4
什 shen2
同 tong2
王 wang2
下 xia4
一 yi1
有 you3
在 zai4
这 zhe4
藏 cang2
背 bei4
剥 bo1
薄 bo2
刹 cha4
称 cheng1
匙 chi2
臭 chou4
畜 chu4
佛 fo2
缝 feng2
供 gong1
冠 guan1
哄 hong3
夹 jia1
假 jia3
角 jiao3
禁 jin4
卡 ka3
壳 ke2
累 lei4
露 lu4
落 luo4
埋 mai2
模 mo2
泡 pao4
喷 pen1
铺 pu1
圈 quan1
塞 sai1
丧 sang4
盛 sheng4
熟 shu2
率 lv4
缩 suo1
台 tai2
逃 tao2
淘 tao2
帖 tie3
歪 wai1
为 wei4
吓 xia4
鲜 xian1
旋 xuan2
咽 yan4
晕 yun1
咋 za3
仔 zai3
占 zhan4
折 zhe2
挣 zheng4
止 zhi3
爪 zhua3
钻 zuan1
"""

# pinyin syllable → expected FIRST bopomofo symbol (for the zhuyin
# cross-check). Initials map 1:1; zero-initial syllables start with their
# (first) final symbol; y/w rows start with ㄧ/ㄨ/ㄩ medials.
_INI2ZY = {"b": "ㄅ", "p": "ㄆ", "m": "ㄇ", "f": "ㄈ", "d": "ㄉ", "t": "ㄊ",
           "n": "ㄋ", "l": "ㄌ", "g": "ㄍ", "k": "ㄎ", "h": "ㄏ", "j": "ㄐ",
           "q": "ㄑ", "x": "ㄒ", "zh": "ㄓ", "ch": "ㄔ", "sh": "ㄕ",
           "r": "ㄖ", "z": "ㄗ", "c": "ㄘ", "s": "ㄙ"}
_FIN2ZY = {"a": "ㄚ", "ai": "ㄞ", "an": "ㄢ", "ang": "ㄤ", "ao": "ㄠ",
           "o": "ㄛ", "ou": "ㄡ", "e": "ㄜ", "ei": "ㄟ", "en": "ㄣ",
           "eng": "ㄥ", "er": "ㄦ"}


def expected_zhuyin(syllable: str) -> str | None:
    for ini in ("zh", "ch", "sh"):
        if syllable.startswith(ini):
            return _INI2ZY[ini]
    c0 = syllable[0]
    if c0 in _INI2ZY:
        return _INI2ZY[c0]
    if c0 == "y":
        return "ㄩ" if syllable[:3] in ("yu", "yua", "yue", "yun") or \
            syllable[:2] == "yu" else "ㄧ"
    if c0 == "w":
        return "ㄨ"
    return _FIN2ZY.get(syllable)


def parse_cjk_pm(path: str):
    """→ list of (block_key, [line_chars...]) from a Collate/CJK .pm file."""
    data = open(path, encoding="utf-8").read()
    data = data.split("__DATA__")[1].split("__END__")[0]
    blocks, cur = [], None
    for raw in data.strip().splitlines():
        toks = raw.split()
        if not toks:
            continue
        if toks[0].startswith("FDD0-"):
            cur = (toks[0].split("-")[1], [])
            blocks.append(cur)
            toks = toks[1:]
            if not toks:
                continue
        chars = [chr(int(t, 16)) for t in toks if "-" not in t]
        if chars:
            cur[1].append(chars)
    return blocks


def _key(label: str):
    """'zhang3' → ('zhang', 3); tone 5 sorts last like CLDR (ā á ǎ à a)."""
    m = re.fullmatch(r"([a-z]+)([1-5])", label)
    return (m.group(1), int(m.group(2)))


def _dominant(chars, zy_first):
    """Most common bopomofo first-symbol of a char list (None if unknown)."""
    c = Counter(zy_first[ch] for ch in chars if ch in zy_first)
    return c.most_common(1)[0][0] if c else None


def _lis_filter(labeled: list[tuple[int, tuple]]) -> set[int]:
    """Longest non-decreasing subsequence over (line_idx, key) pairs
    (equal keys allowed: one group may be split across wrap fragments);
    returns the surviving line indices."""
    if not labeled:
        return set()
    keys = [k for _, k in labeled]
    n = len(keys)
    best = [1] * n
    prev = [-1] * n
    for i in range(n):
        for j in range(i):
            if keys[j] <= keys[i] and best[j] + 1 > best[i]:
                best[i] = best[j] + 1
                prev[i] = j
    i = max(range(n), key=lambda t: best[t])
    keep = set()
    while i != -1:
        keep.add(labeled[i][0])
        i = prev[i]
    return keep


def build():
    seeds: dict[str, str] = {}
    for line in _SEED_DATA.strip().splitlines():
        label, chars = line.split()
        assert re.fullmatch(r"[a-z]+[1-5]", label), label
        for ch in chars:
            assert ch not in seeds, f"duplicate seed {ch}"
            seeds[ch] = label
    overrides: dict[str, str] = {}
    for line in _OVERRIDES.strip().splitlines():
        ch, label = line.split()
        overrides[ch] = label

    # char → zhuyin block first-symbol
    zy_first: dict[str, str] = {}
    for key, lines in parse_cjk_pm(ZHUYIN_PM):
        sym = chr(int(key, 16))
        for line in lines:
            for ch in line:
                zy_first[ch] = sym

    def line_vote(chars, letter=None):
        """Strict-majority seed label of a char list, or None. Votes whose
        label can't belong to the current block (wrong first letter) are
        discarded up front — e.g. CLDR parks 掠/略 (lüè) inside the è
        group; their lve4 votes must not outvote the true label."""
        votes = Counter(seeds[c] for c in chars
                        if c in seeds and
                        (letter is None or seeds[c].startswith(letter)))
        top = votes.most_common(2)
        if not top or (len(top) > 1 and top[0][1] == top[1][1]):
            return None
        return top[0][0]

    stats = Counter()
    lex: dict[str, str] = {}
    for letter_hex, lines in parse_cjk_pm(PINYIN_PM):
        letter = chr(int(letter_hex, 16)).lower()
        # 0. group: a 10-char line may wrap into its successor. Merge when
        # the successor carries no seed majority that CONTRADICTS the
        # running group's (no votes at all → merge, trusting the wrap
        # convention; the zhuyin check below catches bad merges).
        groups: list[list[str]] = []
        for line in lines:
            if (groups and len(groups[-1]) % 10 == 0):
                g_label = line_vote(groups[-1], letter)
                l_label = line_vote(line, letter)
                # no-conflict → merge; when one side has no seeds at all,
                # additionally require the two fragments' dominant bopomofo
                # first-symbols to agree (cheap guard against absorbing an
                # unrelated 10-char-aligned neighbor group)
                merge = (l_label == g_label or
                         ((g_label is None or l_label is None) and
                          _dominant(groups[-1], zy_first) ==
                          _dominant(line, zy_first)))
                if merge:
                    groups[-1].extend(line)
                    stats["merged_wrapped_lines"] += 1
                    continue
            groups.append(list(line))
        # 1. vote
        labels: list[str | None] = []
        for g in groups:
            label = line_vote(g, letter)
            if label is None:
                labels.append(None)
                stats["group_unvoted"] += 1
                continue
            labels.append(label)
        # 2. order (strictly increasing collation keys; ü-syllables exempt)
        labeled = [(i, _key(l)) for i, l in enumerate(labels)
                   if l and "v" not in l]
        keep = _lis_filter(labeled)
        exempt = {i for i, l in enumerate(labels) if l and "v" in l}
        for i, l in enumerate(labels):
            if l and i not in keep and i not in exempt:
                labels[i] = None
                stats["group_order_drop"] += 1
        # 3. zhuyin group-level check
        for i, l in enumerate(labels):
            if not l:
                continue
            exp = expected_zhuyin(_key(l)[0])
            checkable = [c for c in groups[i] if c in zy_first]
            if exp and checkable:
                ok = sum(1 for c in checkable if zy_first[c] == exp)
                if ok < 0.7 * len(checkable):
                    labels[i] = None
                    stats["group_zhuyin_drop"] += 1
        # 4. same-syllable tone interpolation
        i = 0
        while i < len(labels):
            if labels[i] is not None:
                i += 1
                continue
            j = i
            while j < len(labels) and labels[j] is None:
                j += 1
            if i > 0 and j < len(labels):
                s1, t1 = _key(labels[i - 1])
                s2, t2 = _key(labels[j])
                if s1 == s2 and t2 - t1 - 1 == j - i:
                    for k in range(i, j):
                        labels[k] = f"{s1}{t1 + (k - i + 1)}"
                        stats["group_interpolated"] += 1
            i = j
        # 5. emit chars (zhuyin char-level filter)
        for g, label in zip(groups, labels):
            if label is None:
                stats["chars_unlabeled"] += len(g)
                continue
            stats["group_labeled"] += 1
            exp = expected_zhuyin(_key(label)[0])
            for ch in g:
                if exp and ch in zy_first and zy_first[ch] != exp:
                    stats["char_zhuyin_drop"] += 1
                    continue
                lex[ch] = label
                stats["chars_labeled"] += 1

    # seeds are authoritative for their own chars; overrides last
    mismatch = sum(1 for c, l in seeds.items() if c in lex and lex[c] != l)
    lex.update(seeds)
    lex.update(overrides)
    stats["seed_vs_line_mismatch"] = mismatch
    return lex, stats


def main():
    lex, stats = build()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("# hanzi→pinyin lexicon generated by tools/"
                "build_zh_lexicon.py\n# from Unicode CLDR collation data "
                "(perl Unicode::Collate::CJK) + curated seeds.\n")
        for ch in sorted(lex, key=ord):
            f.write(f"{ch}\t{lex[ch]}\n")
    for k in sorted(stats):
        print(f"{k}: {stats[k]}", file=sys.stderr)
    print(f"wrote {len(lex)} entries -> {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
